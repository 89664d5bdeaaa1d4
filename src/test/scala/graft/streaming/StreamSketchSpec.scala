package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, Sketches}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sketch parity: the per-hour theta sketch over a
  * MemoryStream equals the batch sketch query over the same rows —
  * including when the stream arrives in several batches, which
  * exercises sketch-state MERGE inside the streaming aggregation. */
class StreamSketchSpec extends SparkSpec {

  test("streaming per-hour theta sketch equals batch events_theta_users") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Dedup.eventsUs(spark, sf)
      .select("ts_us", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val name = s"sk_${System.nanoTime()}"
    val q = StreamSketch.thetaUsersPerHour(
        mem.toDF().toDF("ts_us", "user_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      // three arrival batches → the final state is a merge of partial
      // sketches, not one absorb pass
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val want = Sketches.thetaUsersPerHour(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == want)
  }

  test("stream-maintained daily sketches feed the overlap panel, matching batch") {
    import graft.functions.Hashing.h64
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Dedup.eventsUs(spark, sf)
      .select("ts_us", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val name = s"sko_${System.nanoTime()}"
    // the streaming query maintains ONLY the per-day sketch table
    // (k longs per day of state)
    val q = mem.toDF().toDF("ts_us", "user_id")
      .select(expr("ts_us div 86400000000L").as("day_bucket"),
        h64(concat(lit("u:"), col("user_id").cast("string"))).as("h"))
      .groupBy("day_bucket")
      .agg(graft.plans.ThetaSketchFunctions
        .thetaSketch(col("h"), Sketches.ThetaK).as("mk"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // overlap computed from the MAINTAINED sketch table alone equals
    // the batch panel's sketch-derived columns (exact grading column
    // aside — that one needs raw events by definition)
    val got = Sketches.thetaOverlapOfSketches(spark.table(name)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val want = Sketches.thetaOverlapDaily(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got.nonEmpty && got == want)
  }

  test("streaming MG candidates keep the heavy-hitter guarantee across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val terms = graft.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(r => r.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    val mem = MemoryStream[String]
    val name = s"mg_${System.nanoTime()}"
    val q = StreamSketch.mgCandidates(mem.toDF().toDF("term"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      // three arrival batches → streaming state update + merge paths run
      terms.grouped(math.max(1, terms.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val row = spark.table(name).collect().head
    val sk = row.getMap[String, Long](1).toMap
    val total = row.getLong(2)
    val cap = graft.operators.CorpusStats.HhCapacity
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(total == terms.length.toLong)
    assert(sk.size <= cap)
    // candidates column mirrors the sketch keys
    assert(row.getSeq[String](0).toSet == sk.keySet)
    // MG guarantee over the whole stream: every term with
    // count > n/(cap+1) survives in the merged streaming state
    val mustSurvive = truth.filter { case (_, c) => c * (cap + 1L) > total }.keySet
    assert(mustSurvive.nonEmpty && mustSurvive.subsetOf(sk.keySet))
    // sketch counts never exceed the true counts
    sk.foreach { case (t, est) => assert(est <= truth(t)) }
  }
}
