package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only: single-node THROUGHPUT of the core reference semantic —
  * canonical digest + first-occurrence / TTL-chain dedup — in
  * messages/second, the unit the reference microservice is sized in.
  *
  * Measures, over the sf dir's replica-expanded event stream
  * (3× events rows, the registered dedup queries' exact input):
  *  - `digest_only`: the canonical md5-based envelope hash alone;
  *  - `digest_blake2b`: the reference's own BLAKE2b-512 digest
  *    (byte-parity mode, functions.Blake2b);
  *  - `dedup_first`: digest + global first-occurrence;
  *  - `dedup_chain_native`: digest + the exact ObliviousSet TTL chain
  *    (native ChainDedupExec);
  *  - `stream_chain`: the Structured Streaming chain
  *    (flatMapGroupsWithState) fed the same rows in micro-batches
  *    through a memory source — the shape the reference actually runs.
  *
  * Each measurement is best-of-two on a warmed JVM (the Bench
  * discipline). Emits one JSON line to stdout and
  * SPARK_GRAFT_TPUT_OUT (default ./throughput_out.json). */
object Throughput {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.withDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nRows = Dedup.hashedStream(spark, sfDir).count() // also warms cache
    def bestOf2(f: () => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    // (sec, rows processed) per mode — the blake2b mode runs on the
    // raw envelope frame (no replica expansion), so it carries its own
    // row count
    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Long)]()
    results("digest_only") =
      (bestOf2(() => { Dedup.hashedStream(spark, sfDir).count(); () }), nRows)
    val envRows = graft.sources.Envelope.fromEvents(spark, sfDir).count()
    results("digest_blake2b") = (bestOf2 { () =>
      graft.sources.Envelope.fromEvents(spark, sfDir)
        .withColumn("digest", graft.functions.Hashing.envelopeDigestBlake2b(
          org.apache.spark.sql.functions.col("payload"),
          org.apache.spark.sql.functions.col("properties")))
        .count()
      ()
    }, envRows)
    results("dedup_first") =
      (bestOf2(() => { Dedup.firstOccurrence(Dedup.hashedStream(spark, sfDir)).count(); () }), nRows)
    results("dedup_chain_native") =
      (bestOf2(() => { Dedup.chainNative(Dedup.hashedStream(spark, sfDir)).count(); () }), nRows)

    // streaming: the hashed rows in event-time order, fed through a
    // memory source in micro-batches into the FMGWS chain
    val rows = Dedup.hashedStream(spark, sfDir)
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest")
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, String, Double, String, Long)]
      .collect().toSeq
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_TPUT_BATCHES", "10").toInt
    // shared micro-batch harness: feed `rows` in nb chunks through
    // a memory source into `build`'s streaming frame, drain each batch
    def runStreamN(nb: Int)(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_]): Unit = {
      implicit val sq = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Double, String, Long)]
      val out = build(mem.toDF()
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest"))
      val name = s"tput_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
      try rows.grouped(math.max(1, rows.size / nb)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      } finally q.stop()
    }
    def runStream(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_]): Unit = runStreamN(nBatches)(build)
    // breakdown ladder (same harness, same rows, same batch count):
    //  stream_noop           = micro-batch machinery only (stateless select)
    //  stream_fmgws_passthru = + digest shuffle + typed encode/decode +
    //                          state-store write (dedup decision removed)
    //  stream_chain          = + the chain logic itself
    results("stream_noop") =
      (bestOf2(() => runStream(df => df.select("event_id", "ts_us", "digest"))), nRows)
    results("stream_fmgws_passthru") =
      (bestOf2(() => runStream(df =>
        graft.streaming.StreamDedup.chainPassthrough(spark, df))), nRows)
    results("stream_chain") = (bestOf2(() => runStream(df =>
      graft.streaming.StreamDedup.chain(spark, df, 3600L * 1000000L))), nRows)

    // trigger-size sweep for the chain: the round-13 profile showed the
    // streaming/batch gap is a FIXED per-trigger tax (~0.53 s: shuffle +
    // typed encode + state-store commit), so rows/s scales with trigger
    // size — this measures the knob a deployment turns (bigger trigger
    // = more latency, more throughput) instead of asserting it.
    val sweepBatches = sys.env.getOrElse("SPARK_GRAFT_TPUT_SWEEP", "40,10,4,1")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).filter(_ > 0)
    val sweep = sweepBatches.map { nb =>
      val s = bestOf2(() => runStreamN(nb)(df =>
        graft.streaming.StreamDedup.chain(spark, df, 3600L * 1000000L)))
      val rps = if (s > 0) (nRows / s).toLong else -1L
      val trig = nRows / math.max(nb, 1)
      nb -> s""""$nb":{"trigger_rows":$trig,"sec":${"%.3f".format(s)},"rows_per_sec":$rps}"""
    }
    val sweepJson = sweep.map(_._2).mkString("{", ",", "}")

    val qs = results.map { case (k, (s, n)) =>
      val rps = if (s > 0) (n / s).toLong else -1L
      s""""$k":{"sec":${"%.3f".format(s)},"rows":$n,"rows_per_sec":$rps}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"throughput","rows":$nRows,"cpus":$cpus,"sf":"$sfDir","stream_batches":$nBatches,"modes":$qs,"chain_trigger_sweep":$sweepJson}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_TPUT_OUT", "throughput_out.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[tput] write failed: ${e.getMessage}") }
    spark.stop()
    println(line)
  }
}
