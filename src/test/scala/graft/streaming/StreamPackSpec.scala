package graft.streaming

import graft.SparkSpec
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sequence packing folds to the full-corpus pack: doc-ordered
  * micro-batches through a foreachBatch Packer produce exactly the rows
  * (and final token total) of the one-shot pass. */
class StreamPackSpec extends SparkSpec {

  test("foreachBatch packing over ordered micro-batches equals the one-shot pack") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val perDoc = Seq((1L, 300L), (2L, 300L), (3L, 10L), (4L, 600L),
      (5L, 100L), (6L, 513L), (7L, 0L), (8L, 40L))
    val full = Pipeline.packOf(perDoc.toDF("doc_id", "n_toks"), seqLen = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))

    val packer = new StreamPack.Packer(seqLen = 512L)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Boolean)]
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "n_toks")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf ++= packer.pack(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        ()
      }
      .start()
    try {
      perDoc.grouped(3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    assert(buf.sortBy(_._1).toSeq == full.sortBy(_._1).toSeq)
    assert(packer.totalTokens == perDoc.map(_._2).sum)
  }
}
