package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnvelopeSpec extends SparkSpec {

  test("fromEvents produces the canonical envelope schema") {
    val env = Envelope.fromEvents(spark, sf)
    val names = env.schema.fieldNames.toSet
    assert(Envelope.schema.fieldNames.toSet.subsetOf(names))
    assert(env.count() === graft.Tables.events(spark, sf).count())
  }

  test("digest ignores the event timestamp but not the payload") {
    val env = Envelope.fromEvents(spark, sf)
    val shifted = env.withColumn("event_ts",
      col("event_ts") + expr("INTERVAL 42 SECONDS"))
    val a = env.select(Envelope.digest().as("d")).collect().map(_.getLong(0))
    val b = shifted.select(Envelope.digest().as("d")).collect().map(_.getLong(0))
    assert(a.sorted.toSeq === b.sorted.toSeq)
  }

  test("ignored properties collapse property-only differences") {
    val env = Envelope.fromEvents(spark, sf)
    val mutated = env.withColumn("properties",
      map_concat(col("properties"), map(lit("replica"), lit("2"))))
    val strict = env.unionAll(mutated)
      .select(Envelope.digest().as("d")).distinct().count()
    val loose = env.unionAll(mutated)
      .select(Envelope.digest(ignored = Seq("replica")).as("d")).distinct().count()
    assert(loose < strict)
  }

  test("readJson round-trips the envelope shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_env_json").toString
    val env = Envelope.fromEvents(spark, sf)
      .filter(col("event_id") < 50)
      .select("payload", "properties", "event_ts", "topic")
    env.write.mode("overwrite").options(Envelope.jsonOptions).json(dir)
    val back = Envelope.readJson(spark, dir)
    assert(back.count() === 50)
    assert(back.schema.fieldNames.toSeq === Envelope.schema.fieldNames.toSeq)
    // digests survive the round trip (payload bytes + properties intact)
    val a = env.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    val b = back.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    // and so do MICROSECOND event times (jsonOptions owns the format —
    // Spark's default JSON timestamp write truncates to milliseconds)
    val ta = env.select(unix_micros(col("event_ts"))).collect().map(_.getLong(0)).sorted
    val tb = back.select(unix_micros(col("event_ts"))).collect().map(_.getLong(0)).sorted
    assert(ta.toSeq === tb.toSeq && ta.exists(_ % 1000 != 0),
      "µs fractions must survive the JSON round trip")
  }

  test("readOrc round-trips the envelope natively (binary, map, µs timestamps)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_env_orc").toString
    val env = Envelope.fromEvents(spark, sf)
      .filter(col("event_id") < 50)
      .select("payload", "properties", "event_ts", "topic")
    env.write.mode("overwrite").orc(dir)
    val back = Envelope.readOrc(spark, dir)
    assert(back.count() === 50)
    assert(back.schema.fieldNames.toSeq === Envelope.schema.fieldNames.toSeq)
    val a = env.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    val b = back.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    val ta = env.select(unix_micros(col("event_ts"))).collect().map(_.getLong(0)).sorted
    val tb = back.select(unix_micros(col("event_ts"))).collect().map(_.getLong(0)).sorted
    assert(ta.toSeq === tb.toSeq && ta.exists(_ % 1000 != 0))
  }

  test("readCsv round-trips the envelope through the base64/JSON wire form") {
    val dir = java.nio.file.Files.createTempDirectory("graft_env_csv").toString
    val env = Envelope.fromEvents(spark, sf)
      .filter(col("event_id") < 50)
      .select("payload", "properties", "event_ts", "topic")
    Envelope.toCsvFrame(env).write.mode("overwrite")
      .options(Envelope.csvOptions).csv(dir)
    val back = Envelope.readCsv(spark, dir)
    assert(back.count() === 50)
    assert(back.schema.fieldNames.toSeq === Envelope.schema.fieldNames.toSeq)
    val a = env.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    val b = back.select(Envelope.digest().as("d")).collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    // event times survive at FULL microsecond precision (the default
    // CSV timestampFormat truncates to millis — csvOptions prevents it)
    def ts(df: org.apache.spark.sql.DataFrame) =
      df.select(unix_micros(col("event_ts")).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ts(back) === ts(env))
    assert(ts(env).exists(_ % 1000 != 0), "fixture must carry sub-ms precision")
  }

  test("firstOccurrence over a duplicated envelope stream keeps one per digest") {
    val env = Envelope.fromEvents(spark, sf)
    val dup = env.unionAll(env.withColumn("event_ts",
      col("event_ts") + expr("INTERVAL 37 SECONDS")))
    val out = Envelope.firstOccurrence(dup)
    assert(out.count() === env.select(Envelope.digest().as("d")).distinct().count())
  }
}
