package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streamed per-group KMV sample equals the batch aggregate over
  * the same rows, and its ids are exactly the batch sampler's
  * (`sample_per_source`) — one sampling definition, two runtimes. */
class StreamSampleSpec extends SparkSpec {

  private val K = 3

  test("streamed per-group sample equals batch kernel and the batch sampler") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = graft.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val mem = MemoryStream[(String, Long)]
    val name = s"smp_${System.nanoTime()}"
    val q = StreamSample
      .perGroupSample(mem.toDF().toDF("source", "doc_id"), "source", "doc_id", K)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1))))
      .toMap
    val got = asMap(spark.table(name))
    val batch = asMap(StreamSample
      .perGroupSample(rows.toDF("source", "doc_id"), "source", "doc_id", K))
    assert(got === batch)
    // the sampled ids are the batch sampler's rows (same seeded hash)
    val sampler = graft.operators.DocDedup.samplePerSource(spark, sf, K)
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (src, pairs) =>
      assert(pairs.map(_._2).toSet === sampler(src), s"source $src")
      // sorted by hash, size exactly K on this corpus
      assert(pairs.map(_._1) === pairs.map(_._1).sorted)
      assert(pairs.length === K)
    }
  }
}
