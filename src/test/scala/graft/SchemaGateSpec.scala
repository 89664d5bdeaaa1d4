package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class SchemaGateSpec extends SparkSpec {

  test("contract holds on the driver testdata") {
    assert(SchemaGate.check(spark, sf).isEmpty)
  }

  test("missing column and unreadable table produce one clear message each") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-gate").toString
    // events without `props`, ts as int64 → one missing-column violation.
    Seq((1L, 1L, 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$root/events.parquet")
    val violations = SchemaGate.check(spark, root)
    assert(violations.exists(v => v.contains("'events'") && v.contains("'props'")))
    assert(violations.exists(v => v.contains("'region' unreadable")))
    // exactly one violation per missing table, not a stack trace
    assert(violations.count(_.contains("unreadable")) == SchemaGate.requiredColumns.size - 1)
  }

  test("unsupported ts encoding is called out by name") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-gate-ts").toString
    Seq((1L, "2024-01-01", 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$root/events.parquet")
    val violations = SchemaGate.check(spark, root)
    assert(violations.exists(_.contains("unsupported physical type")))
  }
}
