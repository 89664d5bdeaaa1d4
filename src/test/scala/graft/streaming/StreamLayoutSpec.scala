package graft.streaming

import graft.SparkSpec
import graft.operators.Layout
import graft.sinks.TxnParquet
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming layout ingest: stream-routed rows must land exactly once,
  * in exactly the files the batch router picks — the streaming path is
  * the same frozen-quantizer routing plus the idempotent sink, so the
  * end state is bit-equal to routing all rows in one batch. */
class StreamLayoutSpec extends SparkSpec {

  test("stream-routed appends equal one-shot batch routing, exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val manifest = Layout.zRangeManifest(spark, sf)
    val dom = Layout.domain(spark, sf)
    val rows = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val outDir = java.nio.file.Files.createTempDirectory("slayout").toString

    val mem = MemoryStream[(Long, Int, Long, Long)]
    val q = StreamLayout.routeAndAppend(
      mem.toDF().toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      manifest, dom, outDir)
    try rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    } finally q.stop()

    val got = TxnParquet.read(spark, outDir)
      .select("l_orderkey", "l_linenumber", "file_id")
    val want = Layout.assignToManifest(
      rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      manifest, dom)
      .select("l_orderkey", "l_linenumber", "file_id")
    assert(got.count() == rows.length) // exactly once
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // a replayed epoch is a committed no-op: re-appending batch 0's
    // rows under its id changes nothing
    assert(!TxnParquet.append(
      Layout.assignToManifest(
        rows.take(5).toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        manifest, dom), outDir, 0L))
    assert(TxnParquet.read(spark, outDir).count() == rows.length)
  }
}
