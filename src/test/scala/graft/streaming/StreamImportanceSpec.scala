package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** QualityModels.dsirScoreOf is the streaming importance gate: the
  * trained O(buckets) model is a static broadcast side, the corpus
  * streams through the same narrow derivation + single aggregation
  * (update/complete-mode legal), and the micro-batched result equals
  * the one-shot batch scores. This is the deploy shape for
  * importance-weighted ingest: train once in batch, gate the stream. */
class StreamImportanceSpec extends SparkSpec {

  test("micro-batched dsir scoring equals the batch scores") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val buckets = graft.operators.QualityModels.dsirBucketTable(spark, sf)
      .localCheckpoint() // freeze the trained model across micro-batches
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val name = s"si_${System.nanoTime()}"
    val q = graft.operators.QualityModels.dsirScoreOf(
        mem.toDF().toDF("doc_id", "text"), buckets)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val want = graft.operators.QualityModels.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == want)
  }
}
