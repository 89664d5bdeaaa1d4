package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming decontamination gate equals the batch contamination
  * report on the same documents — a stream-static join against the
  * fixed benchmark shingle table, fed in several micro-batches. */
class StreamContaminationSpec extends SparkSpec {

  test("streamed train docs produce the batch contamination report") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evalSh = StreamContamination.evalShingles(spark, sf)
    val train = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % Curation.EvalMod =!= 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val name = s"sc_${System.nanoTime()}"
    val q = StreamContamination.contaminationFlags(
        mem.toDF().toDF("doc_id", "text"), evalSh)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      train.grouped(math.max(1, train.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name)
      .filter(col("n_contaminated") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = Curation.contamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == want)
  }
}
