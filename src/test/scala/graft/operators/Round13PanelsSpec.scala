package graft.operators

import graft.SparkSpec

import java.math.{BigDecimal => JBD, RoundingMode}

/** Round-13 wave-1 panels vs independent in-memory models at sf0.001:
  * orders_assoc_rules, events_user_predictability, q9_product_revenue.
  */
class Round13PanelsSpec extends SparkSpec {

  private def halfUp(num: Long, den: Long): Long = (num + den / 2) / den

  test("assocRules: both directions of every basket pair, exact confidence") {
    val pairs = Analytics6.basketPairs(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val expected = pairs.flatMap { case (p1, p2, s12, s1, s2, lift) =>
      Seq((p1, p2, s12, s1, halfUp(s12 * 10000L, math.max(s1, 1L)) / 1e4, lift),
        (p2, p1, s12, s2, halfUp(s12 * 10000L, math.max(s2, 1L)) / 1e4, lift))
    }.sortBy(r => (r._1, r._2))
    val got = Analytics6.assocRules(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got == expected)
    // the rule table is exactly the symmetric closure: every pair twice,
    // confidence bounded by 1, and the direction rows share supp + lift
    assert(got.size == 2 * pairs.size)
    assert(got.forall(r => r._5 > 0 && r._5 <= 1.0))
  }

  test("userPredictability: banded Simpson concentration matches the driver model") {
    val ev = Dedup.eventsUs(spark, sf).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).values.toSeq
      val n = counts.sum
      val k = counts.size.toLong
      val s2 = counts.map(c => c * (c - 1L)).sum
      val r4 = halfUp(s2 * 10000L, math.max(n * (n - 1L), 1L))
      (r4 / 500L, n, k)
    }.groupBy(_._1).toSeq.map { case (band, us) =>
      (band, us.size.toLong, us.map(_._2).sum, us.map(_._3).sum)
    }.sortBy(_._1)
    val got = Analytics6.userPredictability(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected)
    // bands live on the exact 0..20 grid
    assert(got.forall(b => b._1 >= 0L && b._1 <= 20L))
  }

  test("q9: revenue per (nation, o_year) for the 'red' family, decimal-exact") {
    val partRed = graft.Tables.part(spark, sf)
      .collect().filter(_.getAs[String]("p_name").contains("red"))
      .map(_.getAs[Long]("p_partkey")).toSet
    val suppNation = {
      val nat = graft.Tables.nation(spark, sf).collect()
        .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name")).toMap
      graft.Tables.supplier(spark, sf).collect()
        .map(r => r.getAs[Long]("s_suppkey") -> nat(r.getAs[Long]("s_nationkey"))).toMap
    }
    // year extraction normalized through Spark (the physical o_orderdate
    // encoding varies across data generations — date vs timestamp)
    val orderYear = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.year(
          org.apache.spark.sql.functions.col("o_orderdate")).cast("long").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
    val acc = scala.collection.mutable.Map[(String, Long), JBD]()
    li.foreach { r =>
      if (partRed(r.getLong(1))) {
        val key = (suppNation(r.getLong(2)), orderYear(r.getLong(0)))
        val dp = new JBD(r.getDouble(3)).setScale(4, RoundingMode.HALF_UP)
          .multiply(JBD.ONE.subtract(
            new JBD(r.getDouble(4)).setScale(4, RoundingMode.HALF_UP)))
        acc(key) = acc.getOrElse(key, JBD.ZERO).add(dp)
      }
    }
    val expected = acc.toSeq.map { case ((nation, y), v) =>
      (nation, y, v.setScale(2, RoundingMode.HALF_UP).doubleValue)
    }.sortBy(r => (r._1, r._2))
    val got = Analytics2.q9(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
  }
}
