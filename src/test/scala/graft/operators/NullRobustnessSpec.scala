package graft.operators

import graft.SparkSpec
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Pins the behavior of the canonical hasher on degenerate inputs —
  * the reference logs-and-skips malformed property bags
  * (cacheBuilding.ts getDigests); our digest treats them as empty. */
class NullRobustnessSpec extends SparkSpec {

  test("malformed or null props canonicalize to the empty bag") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 1}"""),
      (2L, """not json"""),
      (3L, null.asInstanceOf[String]),
      (4L, """{}""")
    ).toDF("id", "props")
      .withColumn("canon", Hashing.canonicalProps(col("props"), Nil))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(1L) === "k=1")
    assert(m(2L) === "")   // unparseable → empty bag, row still hashable
    assert(m(3L) === "")
    assert(m(4L) === "")
  }

  test("digest is non-null for every degenerate row") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.0, """{"k":1}"""), (2L, "b", 0.0, null.asInstanceOf[String]))
      .toDF("user_id", "event_type", "value", "props")
      .withColumn("digest",
        Hashing.eventDigest(col("user_id"), col("event_type"), col("value"), col("props")))
    assert(df.filter(col("digest").isNull).count() === 0)
  }

  test("chain dedup of an empty stream is empty, of one row is that row") {
    import spark.implicits._
    val schema = Seq((0L, 0L, 0L, "x", 0.0, "{}", 7L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest")
    assert(Dedup.chain(schema.limit(0)).count() === 0)
    assert(Dedup.chain(schema).count() === 1)
    assert(Dedup.chainNative(schema.limit(0)).count() === 0)
    assert(Dedup.chainNative(schema).count() === 1)
  }
}
