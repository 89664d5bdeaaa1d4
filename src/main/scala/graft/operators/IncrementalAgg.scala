package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for the rollup panels: (key → count,
  * sum-of-cents) state kept exact under APPEND and RETRACT batches.
  *
  * (count, sum) over int64 cents is a ℤ-group — the same algebraic fact
  * the trained-model maintenance exploits (QualityModels merge/retire):
  * a retraction is just the batch's aggregate with negated signs, and
  * folding any sequence of deltas into the state equals re-aggregating
  * the surviving rows from scratch, in ANY batch order. That turns an
  * hourly 100 TB re-aggregation into an O(batch) delta + an O(state)
  * merge, with late-arriving corrections handled by the same path as
  * new data.
  *
  * Zero rows (count 0 after a full retraction) are dropped on merge, so
  * state size tracks LIVE keys, not historical ones.
  */
object IncrementalAgg {

  /** Aggregate one batch into a signed delta frame
    * (keys..., n, sum_cents) — sign −1 builds a retraction. */
  def delta(batch: DataFrame, keys: Seq[String], valueCents: Column,
            sign: Int = 1): DataFrame = {
    require(sign == 1 || sign == -1, s"sign must be ±1, got $sign")
    batch.groupBy(keys.map(col): _*)
      .agg((count(lit(1)) * sign).as("n"),
        (sum(valueCents) * sign).as("sum_cents"))
  }

  /** Fold a delta into the state: full-outer add on the keys, zero
    * rows dropped. Both sides are (keys..., n, sum_cents). */
  def merge(state: DataFrame, d: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+ col("n").as("n_a") :+
        col("sum_cents").as("s_a"): _*)
      .join(d.select(keys.map(col) :+ col("n").as("n_b") :+
        col("sum_cents").as("s_b"): _*), keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n") :+
        (coalesce(col("s_a"), lit(0L)) + coalesce(col("s_b"), lit(0L)))
          .as("sum_cents"): _*)
      .filter(col("n") =!= 0L)

  /** state + appended rows. */
  def applyAppend(state: DataFrame, batch: DataFrame, keys: Seq[String],
                  valueCents: Column): DataFrame =
    merge(state, delta(batch, keys, valueCents, 1), keys)

  /** state − retracted rows (the exact inverse of the append). */
  def applyRetract(state: DataFrame, batch: DataFrame, keys: Seq[String],
                   valueCents: Column): DataFrame =
    merge(state, delta(batch, keys, valueCents, -1), keys)

  /** The from-scratch truth the incremental fold must equal. */
  def batchAggregate(rows: DataFrame, keys: Seq[String],
                     valueCents: Column): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueCents).as("sum_cents"))
}
