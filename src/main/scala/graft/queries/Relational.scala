package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Q, Tables}

/** Core relational operator inventory (SURVEY.md §2) re-expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Determinism rules (SURVEY.md §7): every output is totally ordered (ORDER
  * BY with tie-breaks on both sides), aggregate sums go through DECIMAL so
  * results are exact and order-independent, and averages are emitted as
  * `CAST(decimal_sum AS DOUBLE) / count` so both engines compute the same
  * IEEE division of identical inputs.
  */
object Relational {

  private val D182  = DecimalType(18, 2)
  private val D382  = DecimalType(38, 2)

  /** A1 + pricing-summary aggregation (reference counts at
    * transform_raw_data.py:201,217,233 generalized to grouped aggregates).
    * Scale note: partial (map-side) aggregation on 2 low-cardinality keys
    * makes the shuffle tiny regardless of input size.
    */
  val q_a1_agg: Q = Q(
    "q_a1_agg",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
             COUNT(*) AS count_order,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """),
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(D182)).cast(D382).as("sum_qty"),
        sum(col("l_extendedprice").cast(D182)).cast(D382).as("sum_base_price"),
        count(lit(1)).as("count_order"),
      )
      .withColumn("avg_qty", col("sum_qty").cast(DoubleType) / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** T1 global top-k (generate_report.py:35): orderBy+limit plans as
    * TakeOrderedAndProject — a true distributed top-k (per-partition heap +
    * single k-row gather), never a full sort, at any scale.
    */
  val q_t1_topk: Q = Q(
    "q_t1_topk",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10
    """),
  ) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Multi-way join with broadcast dimensions (§2.3): revenue per nation.
    * nation/region/customer/supplier are small dims → broadcast-hash joins;
    * only the lineitem↔orders join shuffles. At 100 TB the fact-fact join is
    * the one shuffle you cannot avoid; AQE handles skew.
    */
  val q_join_revenue_by_nation: Q = Q(
    "q_join_revenue_by_nation",
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY n_name
    """),
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        sum(col("l_extendedprice").cast(D182) * (lit(1) - col("l_discount").cast(D182)))
          .cast(DecimalType(38, 4)).as("revenue"),
        count(lit(1)).as("n_items"),
      )
      .orderBy("n_name")
  }

  def all: Seq[Q] = Seq(q_a1_agg, q_t1_topk, q_join_revenue_by_nation)
}
