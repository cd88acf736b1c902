package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class LayoutSpec extends SparkSpec {

  test("co-bucketed fact-fact join plans with zero exchanges") {
    // the in-memory catalog forgets tables between JVMs but their warehouse
    // dirs persist — clear both before writing
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
    Layout.writeBucketed(o, "o_b", "o_orderkey", 8)
    // hint("merge"): at this tiny SF the planner would broadcast (its own
    // Exchange); the claim under test is the co-located SORT-MERGE path a
    // real fact-fact join takes at scale.
    val joined = Layout.readTable(spark, "li_b").hint("merge")
      .join(Layout.readTable(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // and the result matches the unbucketed plan
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("l_orderkey").collect().toSeq ===
      expected.orderBy("l_orderkey").collect().toSeq)
  }

  test("partitioned curated layout prunes partitions under a filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/orders_part"
    Layout.writePartitioned(
      Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice", "o_orderstatus"),
      dir, "o_orderstatus")
    val scan = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning in:\n$plan")
    val all = Tables.orders(spark, sf()).filter("o_orderstatus = 'F'").count()
    assert(scan.count() === all)
  }
}
