package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kafka wire-shape mapping, broker-free: a frame with the exact Kafka
  * source schema round-trips through envelope form losslessly. */
class KafkaEnvelopeSpec extends SparkSpec {

  private def kafkaShaped = {
    import spark.implicits._
    Seq(
      (Array[Byte](1, 2, 3), "t1", 0, 0L, new java.sql.Timestamp(1000L),
        Seq(("a", "1".getBytes("UTF-8")), ("b", "x".getBytes("UTF-8")))),
      (Array[Byte](9), "t2", 1, 7L, new java.sql.Timestamp(2000L),
        Seq.empty[(String, Array[Byte])])
    ).toDF("value", "topic", "partition", "offset", "timestamp", "hdr")
      .withColumn("key", lit(null).cast("binary"))
      .withColumn("headers",
        expr("transform(hdr, h -> struct(h._1 as key, h._2 as value))"))
      .drop("hdr")
  }

  test("kafka source frame maps to envelope and back without loss") {
    val env = Envelope.fromKafka(kafkaShaped)
    assert(env.schema.fieldNames.toSeq ===
      Seq("payload", "properties", "event_ts", "topic"))
    val rows = env.orderBy("topic").collect()
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3))
    assert(rows(0).getAs[Map[String, String]]("properties") ===
      Map("a" -> "1", "b" -> "x"))
    assert(rows(1).getAs[Map[String, String]]("properties") === Map.empty)

    val back = Envelope.toKafka(env).orderBy("topic").collect()
    assert(back(0).getAs[Array[Byte]]("value").toSeq === Seq[Byte](1, 2, 3))
    val hdrs = back(0).getAs[Seq[org.apache.spark.sql.Row]]("headers")
      .map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), "UTF-8"))
      .toMap
    assert(hdrs === Map("a" -> "1", "b" -> "x"))
    // key = digest string bytes → stable partition routing for replays
    assert(back(0).getAs[Array[Byte]]("key").nonEmpty)
  }

  test("duplicate kafka header keys take last-wins instead of crashing") {
    import spark.implicits._
    val dup = Seq((Array[Byte](1), "t", 0, 0L, new java.sql.Timestamp(1L),
        Seq(("trace", "a".getBytes("UTF-8")), ("trace", "b".getBytes("UTF-8")))))
      .toDF("value", "topic", "partition", "offset", "timestamp", "hdr")
      .withColumn("key", lit(null).cast("binary"))
      .withColumn("headers",
        expr("transform(hdr, h -> struct(h._1 as key, h._2 as value))"))
      .drop("hdr")
    val props = Envelope.fromKafka(dup)
      .select("properties").collect().head.getAs[Map[String, String]](0)
    assert(props === Map("trace" -> "b"))
  }

  test("envelope digest is header-order independent (canonical properties)") {
    import spark.implicits._
    val e1 = Seq((Array[Byte](5), Map("x" -> "1", "y" -> "2"),
      new java.sql.Timestamp(1L), "t")).toDF("payload", "properties", "event_ts", "topic")
    val e2 = Seq((Array[Byte](5), Map("y" -> "2", "x" -> "1"),
      new java.sql.Timestamp(2L), "t")).toDF("payload", "properties", "event_ts", "topic")
    val d1 = e1.select(Envelope.digest()).collect().head.getLong(0)
    val d2 = e2.select(Envelope.digest()).collect().head.getLong(0)
    assert(d1 === d2)
  }
}
