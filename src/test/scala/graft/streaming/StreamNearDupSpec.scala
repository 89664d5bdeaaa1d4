package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming LSH candidates must equal the batch band-collision set on
  * the same corpus (no bucket saturated), regardless of how the stream
  * is batched. */
class StreamNearDupSpec extends SparkSpec {

  test("streamed candidates equal the batch band-collision pairs across 3 batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)

    // batch truth: distinct cross-band collision pairs, and the premise
    // that no bucket is saturated (otherwise semantics legitimately differ)
    val bands = StreamNearDup.bandSignatures(
      graft.Tables.documents(spark, sf).select("doc_id", "text"))
    val maxBucket = bands.groupBy("band", "sig").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBucket <= graft.operators.MinHashLSH.MaxBucketSize,
      "premise: corpus must not saturate any bucket for exact parity")
    val want = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val mem = MemoryStream[(Long, String)]
    val name = s"snd_${System.nanoTime()}"
    val q = StreamNearDup.candidates(spark,
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
