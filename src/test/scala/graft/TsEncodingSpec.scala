package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.sources.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The events `ts` column has shipped in several physical parquet
  * encodings across testdata generations: TIMESTAMP(NANOS) (which the
  * session's `nanosAsLong` flag surfaces as int64 nanos), TIMESTAMP(MICROS)
  * (TimestampType), and TIMESTAMP(MICROS) without UTC adjustment
  * (TimestampNTZType). A silent regeneration of the testdata must never
  * again zero the whole events family — `Tables.tsUsCol` normalizes all
  * three to identical epoch-µs, asserted here end-to-end through both
  * engine entry points (`Dedup.eventsUs`, `Envelope.fromEvents`).
  */
class TsEncodingSpec extends SparkSpec {

  private def writeVariants(): (String, String, String) = {
    import spark.implicits._
    val base = Seq(
      (1L, 1704067200000000L, 10L, "view", 1.5, """{"k":"a"}"""),
      (2L, 1704067260500000L, 11L, "click", 2.5, """{"k":"b"}"""),
      (3L, 1704070800000001L, 10L, "view", 3.5, """{"k":"c"}"""))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")

    val root = Files.createTempDirectory("graft-ts-enc").toString
    def dirFor(name: String) = s"$root/$name"

    // int64 nanos — what TIMESTAMP(NANOS) parquet looks like to the engine
    // under spark.sql.legacy.parquet.nanosAsLong.
    base.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"${dirFor("nanos")}/events.parquet")

    // TIMESTAMP(MICROS), UTC-adjusted → TimestampType on read.
    base.select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.option("outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(s"${dirFor("micros")}/events.parquet")

    // TIMESTAMP_NTZ (isAdjustedToUTC=false) → TimestampNTZType on read.
    base.select(col("event_id"),
        timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"${dirFor("ntz")}/events.parquet")

    (dirFor("nanos"), dirFor("micros"), dirFor("ntz"))
  }

  private def collectUs(df: DataFrame): Seq[(Long, Long)] =
    df.select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("eventsUs yields identical epoch-µs for nanos/micros/ntz parquet encodings") {
    val (nanos, micros, ntz) = writeVariants()
    val a = collectUs(Dedup.eventsUs(spark, nanos))
    val b = collectUs(Dedup.eventsUs(spark, micros))
    val c = collectUs(Dedup.eventsUs(spark, ntz))
    assert(a == Seq(
      (1L, 1704067200000000L), (2L, 1704067260500000L), (3L, 1704070800000001L)))
    assert(b == a)
    assert(c == a)
  }

  test("Envelope.fromEvents event_ts is encoding-agnostic") {
    val (nanos, micros, ntz) = writeVariants()
    def ts(dir: String): Seq[Long] =
      Envelope.fromEvents(spark, dir)
        .select(unix_micros(col("event_ts")))
        .collect().map(_.getLong(0)).toSeq.sorted
    val a = ts(nanos)
    assert(a == Seq(1704067200000000L, 1704067260500000L, 1704070800000001L))
    assert(ts(micros) == a)
    assert(ts(ntz) == a)
  }

  test("tsUsCol rejects a non-timestamp physical type with a clear message") {
    import spark.implicits._
    val bad = Seq(("x", 1)).toDF("ts", "v")
    val e = intercept[IllegalArgumentException](Tables.tsUsCol(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
