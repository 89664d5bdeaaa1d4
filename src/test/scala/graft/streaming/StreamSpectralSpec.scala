package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, Tables}
import graft.operators.{Similarity, Spectral}

/** Streaming Gram-moment parity: the buffer maintained across several
  * micro-batches equals the batch aggregate over the same vectors —
  * exercising the element-wise-add MERGE path inside a streaming
  * aggregation — and the spectrum read off the streamed buffer equals
  * the batch spectrum. */
class StreamSpectralSpec extends SparkSpec {

  private val d = Similarity.Dim

  test("streamed moment buffer equals the batch aggregate over the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000d)).toSeq)
    val mem = MemoryStream[Seq[Long]]
    val name = s"gram_${System.nanoTime()}"
    val q = StreamSpectral.gramMoments(mem.toDF().toDF("u"), d)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).head()
    val batch = StreamSpectral.gramMoments(rows.toSeq.toDF("u"), d).head()
    assert(got.getLong(0) === rows.length.toLong)
    assert(got.getSeq[Long](1) === batch.getSeq[Long](1))
  }

  test("streamed per-label buffers equal the batch groupBy over the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.embeddings(spark, sf).select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong,
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000d)).toSeq))
    val mem = MemoryStream[(Long, Seq[Long])]
    val name = s"lgram_${System.nanoTime()}"
    val q = StreamSpectral.labelMoments(mem.toDF().toDF("label", "u"), d)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val want = StreamSpectral.labelMoments(rows.toSeq.toDF("label", "u"), d)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    assert(got === want)
  }

  test("spectrum off the streamed buffer matches the covariance query's") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000d)).toSeq)
    val mem = MemoryStream[Seq[Long]]
    val name = s"gram2_${System.nanoTime()}"
    val q = StreamSpectral.gramMoments(mem.toDF().toDF("u"), d)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try { mem.addData(rows.toIndexedSeq); q.processAllAvailable() } finally q.stop()
    val g = spark.table(name).head().getSeq[Long](1).toArray
    // cov from the buffer, same formula as Spectral.spectrum
    val n = g(0).toDouble
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      val p = g(1 + d + lo * d - lo * (lo - 1) / 2 + (hi - lo))
      (n * p - g(1 + i).toDouble * g(1 + j)) / (n * n)
    }
    val (streamEigs, _) = Spectral.jacobiEigen(cov)
    val (batchEigs, _) = Spectral.spectrum(spark, sf)
    assert(streamEigs.toSeq === batchEigs.toSeq)
  }
}
