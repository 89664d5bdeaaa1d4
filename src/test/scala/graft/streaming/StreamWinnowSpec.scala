package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming winnowing co-occurrence: after tombstone resolution the
  * accumulated fragments must reproduce batch `winnowingPairs` on the
  * same corpus regardless of prefix batching, and a hash breaching the
  * df cap must die exactly once, killing every fragment it emitted. */
class StreamWinnowSpec extends SparkSpec {

  test("tombstone-resolved streamed pairs equal batch winnowingPairs across 4 batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val fps = graft.operators.DocDedup.winnowFingerprintsOf(docs)
      .as[StreamWinnow.Fp].collect().sortBy(f => (f.doc_id, f.h))

    val want = graft.operators.DocDedup.winnowingPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val mem = MemoryStream[StreamWinnow.Fp]
    val name = s"swn_${System.nanoTime()}"
    val q = StreamWinnow
      .fragments(mem.toDS(), graft.operators.DocDedup.MaxFpDf)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      fps.grouped(math.max(1, fps.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = StreamWinnow
      .pairsFromFragments(spark.table(name),
        graft.operators.DocDedup.MinSharedFp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("a hash breaching the df cap dies exactly once and drops every fragment") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamWinnow.Fp]
    val name = s"swd_${System.nanoTime()}"
    val q = StreamWinnow.fragments(mem.toDS(), maxDf = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: hash 7 and the two live hashes each reach the cap
      mem.addData(StreamWinnow.Fp(1, 7), StreamWinnow.Fp(2, 7),
        StreamWinnow.Fp(1, 9), StreamWinnow.Fp(2, 9),
        StreamWinnow.Fp(1, 11), StreamWinnow.Fp(2, 11))
      q.processAllAvailable()
      // batch 2: docs 3 and 4 push hash 7 past the cap (one tombstone,
      // the post-death arrival is ignored)
      mem.addData(StreamWinnow.Fp(3, 7), StreamWinnow.Fp(4, 7))
      q.processAllAvailable()
    } finally q.stop()
    val frags = spark.table(name)
    assert(frags.filter(col("dead") && col("h") === 7L).count() === 1L)
    assert(frags.filter(!col("dead") && col("h") === 7L).count() === 1L)
    val pairs = StreamWinnow.pairsFromFragments(frags, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // hash 7's (1,2) fragment is tombstoned away; 9 and 11 carry the pair
    assert(pairs === Seq((1L, 2L, 2L)))
  }
}
