package graft.util

import graft.SparkSpec

class ViewsSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame plan") {
    Tables.registerViews(spark, sf())
    val viaSql = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    val li = Tables.lineitem(spark, sf())
    val o = Tables.orders(spark, sf()).filter("o_orderstatus = 'F'")
    val viaDf = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag").count()
      .orderBy("l_returnflag").collect()
    assert(viaSql.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      viaDf.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("native functions are SQL-addressable after registration") {
    Tables.registerViews(spark, sf())
    val d = spark.sql(
      "SELECT graft_vec_dot(embedding, embedding) AS nrm2 FROM embeddings LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(d.nonEmpty && d.forall(_ > 0.0))
  }
}
