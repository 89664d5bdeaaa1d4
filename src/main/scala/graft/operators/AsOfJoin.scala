package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with the
  * same key and time ≤ the left row's time.
  *
  * Spark has no ASOF JOIN; the naive range-join formulation explodes
  * quadratically per key. This implementation uses the union-scan
  * trick: tag both sides, sort by (key, time, side) within one hash
  * shuffle, and carry the latest right-side attributes forward with
  * `last(..., ignoreNulls)` — one shuffle, linear work, no range
  * explosion, exactly the merge-scan a native engine would run.
  * Right-side rows at the identical timestamp sort first, so a left row
  * ties to the right row at its own time (ASOF `>=` semantics, matching
  * DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** events ⟵asof⟶ the user's latest signup event at or before each
    * event: the canonical "attach the active profile version" shape. */
  def eventsAsOfSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("signup_id"), col("value").as("signup_value"))

    val left = ev.select(col("user_id"), col("ts_us"), lit(1).as("side"),
      col("event_id"), col("event_type"), col("value"),
      lit(null).cast("bigint").as("signup_id"),
      lit(null).cast("double").as("signup_value"))
    val right = signups.select(col("user_id"), col("ts_us"), lit(0).as("side"),
      lit(null).cast("bigint").as("event_id"),
      lit(null).cast("string").as("event_type"),
      lit(null).cast("double").as("value"),
      col("signup_id"), col("signup_value"))

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("side"), col("signup_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    left.unionAll(right)
      .withColumn("asof_signup_id", last(col("signup_id"), ignoreNulls = true).over(w))
      .withColumn("asof_signup_value", last(col("signup_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "ts_us", "user_id", "event_type", "value",
        "asof_signup_id", "asof_signup_value")
      .orderBy("event_id")
  }
}
