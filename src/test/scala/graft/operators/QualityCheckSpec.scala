package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The declarative data-quality gate on frames with PLANTED violations
  * (the real-corpus report is oracle-checked; these pin the counting
  * semantics). */
class QualityCheckSpec extends SparkSpec {

  test("tableChecks counts predicate violations, null predicate = violation") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, Double.NaN), (4L, -0.5))
      .toDF("id", "v")
      // a NULL value makes `v >= 0` NULL → counted as violating
      .union(Seq((5L, Option.empty[Double])).toDF("id", "v"))
    val out = Quality.tableChecks(df, "t", Seq(
      "v_non_negative" -> (col("v") >= 0),
      "id_positive" -> (col("id") > 0L))).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // -1.0, -0.5, NULL violate; NaN does NOT (SQL total order puts
    // NaN above every double — same rule in Spark and DuckDB)
    assert(out("v_non_negative") == 3L)
    assert(out("id_positive") == 0L)
  }

  test("uniqueCheck counts duplicate rows beyond the first per key") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val out = Quality.uniqueCheck(df, "t", "k").collect().head
    assert(out.getLong(2) == 3L) // two extra 1s + one extra 3
  }

  test("refCheck counts orphaned child keys") {
    import spark.implicits._
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.refCheck(child, "c", "fk", parent, "pk").collect().head
    assert(out.getLong(2) == 2L) // both 9s orphaned
  }

  test("the standard report is clean on the generated corpus") {
    val rep = Quality.report(spark, sf).collect()
    assert(rep.length == 8)
    rep.foreach(r => assert(r.getLong(2) == 0L,
      s"${r.getString(0)}.${r.getString(1)} unexpectedly dirty"))
  }
}
