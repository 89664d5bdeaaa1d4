package graft.operators

import graft.functions.Hashing.{dec, money2}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation via salting.
  *
  * A groupBy on a low-cardinality hot key (here: 5 event_types over the
  * whole stream) concentrates each key's rows in one reducer. Salting
  * splits every key into `salts` deterministic sub-keys, aggregates
  * partially per (key, salt), then merges the tiny per-salt partials —
  * two shuffles, but the first spreads each hot key over `salts`
  * reducers and the second moves only keys × salts rows. Exact decimal
  * partials make the merge order-independent, so the result is
  * bit-identical to the direct aggregation (which is how the oracle
  * states it).
  */
object Skew {

  val DefaultSalts = 16

  /** Salted count+sum per event_type over the replicated event stream. */
  def saltedEventAgg(spark: SparkSession, dir: String,
                     salts: Int = DefaultSalts): DataFrame =
    saltedAggOf(Dedup.eventsUs(spark, dir), salts)

  /** [[saltedEventAgg]]'s two-stage plan over any frame carrying
    * (event_id, event_type, value) — shared with the skew bench so the
    * measured plan IS the registered operator's plan. */
  def saltedAggOf(ev: DataFrame, salts: Int = DefaultSalts): DataFrame = {
    val partial = ev
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
    partial
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), money2(sum(col("psum"))).as("sum_value"))
      .orderBy("event_type")
  }

  /** The direct (unsalted) twin of [[saltedAggOf]] — the baseline the
    * skew bench races it against; bit-identical output by the exact
    * decimal-partials argument above. */
  def directAggOf(ev: DataFrame): DataFrame = ev
    .groupBy("event_type")
    .agg(count(lit(1)).as("n"), money2(sum(dec(col("value")))).as("sum_value"))
    .orderBy("event_type")

  /** `events_key_skew`: the DECISION TABLE behind the salting knob —
    * per event_type (the low-cardinality aggregation key of this
    * stream): row count, distinct sub-keys (users), the hottest user's
    * row count, its exact ratio4 share of the type, and the hotness
    * MULTIPLE vs a uniform spread (top·users/rows, ratio4). A type
    * whose skew_x4 is ≈ 1 aggregates safely on the raw key; tens or
    * hundreds means one reducer owns the key's traffic and the
    * operator should go through [[saltedEventAgg]]'s two-stage plan
    * (or rely on AQE skew splitting for joins). Reading this panel IS
    * the capacity-planning step a 100 TB aggregation does before
    * picking a partitioning.
    *
    * Shape: one partial-aggregable (type, user) shuffle, then an
    * O(types) rollup — max/count/sum are all map-side combinable.
    * skew_x4's int64 product top·users·10⁴ bounds the panel at
    * ~9·10¹⁴ per type (top rows × users) — past that, pre-divide the
    * uniform expectation (documented knob). */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.ratio4
    Dedup.eventsUs(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_users"),
        max("n").as("top_user_rows"))
      .select(col("event_type"), col("n_rows"), col("n_users"),
        col("top_user_rows"),
        ratio4(col("top_user_rows"), col("n_rows")).as("top_share4"),
        ratio4(col("top_user_rows") * col("n_users"), col("n_rows"))
          .as("skew_x4"))
      .orderBy("event_type")
  }
}
