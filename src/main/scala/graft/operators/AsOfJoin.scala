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

  /** Generic as-of join: attach to every left row the `carried` columns
    * of the latest right row with the same `key` and right `ts` ≤ left
    * `ts` (nulls when no such row). Carried columns arrive prefixed
    * `asof_`. Ties at identical timestamps resolve to the right row
    * with the greatest carried-column tuple (deterministic).
    *
    * The carried columns travel as ONE struct, so the output always
    * holds the columns of a single right row — per-column carries would
    * tear rows apart whenever a carried value is legitimately null on
    * the latest right row (the null would be filled from an OLDER row).
    *
    * ONE hash exchange on the key for any input sizes — the union-scan
    * shape never materializes a per-key cross product, so a key with
    * millions of rows on both sides stays linear. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           carried: Seq[String]): DataFrame = {
    require(carried.nonEmpty && carried.forall(right.columns.contains),
      s"carried columns $carried must exist on the right side")
    val leftRest = left.columns.toIndexedSeq.filterNot(c => c == key || c == ts)
    val carryType = org.apache.spark.sql.types.StructType(
      carried.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftRest.map(col) :+
        lit(null).cast(carryType).as("__carry"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carried.map(col): _*).as("__carry"): _*)
    // tie key among right rows at one timestamp: the orderable carried
    // columns only — a map-typed carried column cannot participate in a
    // sort key and would fail analysis (ties are then left unordered)
    val tieKey =
      carried.filter(c => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType)) match {
        case Nil => lit(0)
        case cs  => struct(cs.map(c => col(s"__carry.$c")): _*)
      }
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), tieKey)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionAll(r)
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(key), col(ts)) ++ leftRest.map(col) ++
          carried.map(c => col(s"__carry.$c").as(s"asof_$c")): _*)
  }

  /** events ⟵asof⟶ the user's latest signup event at or before each
    * event: the canonical "attach the active profile version" shape. */
  def eventsAsOfSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
    val signups = Dedup.eventsUs(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("signup_id"), col("value").as("signup_value"))
    asOf(ev, signups, "user_id", "ts_us", Seq("signup_id", "signup_value"))
      .select("event_id", "ts_us", "user_id", "event_type", "value",
        "asof_signup_id", "asof_signup_value")
      .orderBy("event_id")
  }
}
