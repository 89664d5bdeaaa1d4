package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Dedup
import graft.streaming.StreamDedup.Msg
import org.apache.spark.sql.functions._

/** The reference rebuilds its dedup cache by re-reading its output
  * topic after a restart (cacheBuilding.ts). Structured Streaming's
  * checkpointed state store makes recovery native: stop the query,
  * start a new one on the same checkpoint, and the TTL-chain state is
  * still there — replicas arriving after the restart are still dropped. */
class CheckpointRecoverySpec extends SparkSpec {

  test("chain dedup state survives a query restart via checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ckpt_test").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")

    val all = Dedup.hashedStream(spark, sf)
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest")
      .as[Msg].collect().sortBy(m => (m.ts_us, m.event_id))
    // batch 1: originals; batch 2 (after restart): +37s and +2h replicas
    val (batch1, batch2) = all.partition(_.event_id < 10000000L)

    def runOnce(msgs: Array[Msg]): Unit = {
      msgs.toSeq.toDF().write.mode("append").parquet(inDir)
      val src = spark.readStream.schema(
        msgs.toSeq.toDF().schema).parquet(inDir)
      val q = StreamDedup.chain(spark, src.toDF(), Dedup.WindowUs)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    runOnce(batch1)   // first incarnation of the query
    runOnce(batch2)   // restarted from the same checkpoint

    val got = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = Dedup.chain(Dedup.hashedStream(spark, sf))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // and specifically: replicas within the TTL window were dropped by
    // state recovered from the checkpoint, not re-forwarded
    assert(got.count(id => id >= 10000000L && id < 20000000L) <
      batch1.length / 100)
  }
}
