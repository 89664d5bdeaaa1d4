package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSkewSpec extends SparkSpec {

  test("asof: every matched signup is the latest at-or-before the event") {
    val out = AsOfJoin.eventsAsOfSignup(spark, sf).collect()
    val signups = Dedup.eventsUs(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id", "ts_us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val (u, t) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      val eligible = signups.filter(s => s._1 == u && s._2 <= t)
      val got = Option(r.getAs[java.lang.Long]("asof_signup_id")).map(_.toLong)
      val want = if (eligible.isEmpty) None
                 else Some(eligible.maxBy(s => (s._2, s._3))._3)
      assert(got === want, s"event ${r.getAs[Long]("event_id")}")
    }
  }

  test("salted aggregation equals the direct aggregation") {
    val salted = Skew.saltedEventAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = Dedup.eventsUs(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Hashing.money2(
          sum(graft.functions.Hashing.dec(col("value")))).as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === direct.toSeq)
  }

  test("keySkew matches a per-(type,user) count model") {
    val rows = Dedup.eventsUs(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val byUser = g.groupBy(_._2).view.mapValues(_.length.toLong)
      val (nRows, nUsers) = (g.length.toLong, byUser.size.toLong)
      val top = byUser.values.max
      def r4(num: Long, den: Long) = ((num * 10000 + den / 2) / den) / 10000.0
      t -> (nRows, nUsers, top, r4(top, nRows), r4(top * nUsers, nRows))
    }
    val got = Skew.keySkew(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5)) === want(r.getString(0)), r.getString(0))
      // skew multiple is ≥ the uniform floor of 1 by definition of max
      assert(r.getDouble(5) >= 0.9999, s"${r.getString(0)} below uniform")
    }
  }

  test("sourceSimilarity: estimates are within [0,1] and symmetric-free") {
    val out = MinHashLSH.sourceSimilarity(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("ivfTopK: neighbors share the query's cell") {
    val out = Similarity.ivfTopK(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rows.length))
    }
  }
}
