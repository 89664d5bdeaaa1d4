package graft

import graft.sources.Envelope
import graft.streaming.Origin
import org.apache.spark.sql.functions._

/** The reference's FULL lifecycle in one test, against the DSv2
  * message source (the bus stand-in):
  *
  *   generate (graft-msggen) → dedup → publish with `origin=[digest]`
  *   → restart → warm-up from the published output (tolerating a
  *   malformed origin) → replayed content suppressed, new content
  *   forwarded.
  *
  * This is `deduplication.ts` + `cacheBuilding.ts` end to end:
  * source → hash → first-occurrence → origin property → getDigests
  * warm-up → anti-join. */
class LifecycleSpec extends SparkSpec {

  test("generate → dedup → publish origin → warm-up → replay suppressed, new forwarded") {
    // --- first incarnation: consume the bus, forward first occurrences
    val bus = spark.read.format("graft-msggen")
      .option("rows", "3000").option("dupEvery", "3").option("partitions", "8")
      .load()
    val forwarded = Envelope.firstOccurrence(bus)
    val published = Origin.withOrigin(forwarded)
      .withColumn("ts_us", unix_micros(col("event_ts")))
    val outDir = java.nio.file.Files.createTempDirectory("graft_lifecycle").toString
    published.write.mode("overwrite").parquet(outDir)

    // --- restart: warm state from the published output topic, with one
    // malformed-origin message in the stream (must be skipped, not fatal)
    val outputTopic = spark.read.parquet(outDir)
      .select("ts_us", "properties")
      .unionByName(
        spark.sql("""SELECT 9999999999999999L AS ts_us,
                     map('origin', 'NOT JSON AT ALL') AS properties"""))
    val nowUs = published.agg(max("ts_us")).collect().head.getLong(0) + 1
    val warmed = Origin.warmDigestsFromOutput(outputTopic, Long.MaxValue / 2, nowUs)
      .select("digest")

    // --- second incarnation input: the full bus replayed (every digest
    // already forwarded) plus one genuinely new message
    val fresh = bus.unionByName(
      spark.sql("""SELECT encode('brand-new-message', 'UTF-8') AS payload,
                   map('k', '1') AS properties,
                   TIMESTAMP '2024-01-05 00:00:00' AS event_ts,
                   'msggen' AS topic"""))
    val out2 = Envelope.firstOccurrence(fresh)
      .join(warmed, Seq("digest"), "left_anti")
      .collect()

    assert(out2.length === 1)
    assert(new String(out2.head.getAs[Array[Byte]]("payload"), "UTF-8") === "brand-new-message")

    // the warm set equals the digests that were actually forwarded
    val wantDigests = forwarded.select("digest").collect().map(_.getLong(0)).toSet
    val gotDigests = warmed.collect().map(_.getLong(0)).toSet
    assert(gotDigests === wantDigests)
  }
}
