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
                     salts: Int = DefaultSalts): DataFrame = {
    val partial = Dedup.eventsUs(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
    partial
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), money2(sum(col("psum"))).as("sum_value"))
      .orderBy("event_type")
  }
}
