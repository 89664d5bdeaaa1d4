package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast-quality analytics over the event stream. */
object Analytics6 {

  val UsPerHour = 3600000000L

  /** #200 `events_forecast_error`: seasonal-naive backtest of the
    * hourly event-count series, per event type. Forecast for hour h is
    * the count at h−24 (period-24 seasonal naive — the standard
    * no-model baseline any real forecaster must beat); the panel
    * reports, over every hour with a defined forecast, the absolute
    * error total, exact-ratio4 MAE, and MASE (seasonal error scaled by
    * the lag-1 persistence error over the same hours — the
    * scale-free "is seasonality real here" score; MASE < 1 means the
    * daily cycle explains more than plain persistence).
    *
    * The hour grid is DENSE (missing hours count 0, via an exploded
    * `sequence` over the corpus hour range) — lag-k over a sparse
    * frame would silently compare non-adjacent hours. All errors are
    * integer counts; MAE/MASE are exact int64 rationals. Shape: one
    * (type,hour) groupBy is the only corpus-sized shuffle; the grid,
    * lag windows and rollup are O(types × hours). The lag-1 error sum
    * is floor-guarded at 1 (a constant series has zero persistence
    * error; the guard only fires when MASE is meaningless anyway). */
  def forecastError(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    val ev = Dedup.eventsUs(spark, dir)
      .select(col("event_type"), intDiv(col("ts_us"), lit(UsPerHour)).as("hour"))
    // one corpus pass: the hour range and the type set are re-derived
    // from the O(types × hours) count frame, not extra event scans
    val counts = ev.groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rng = counts.agg(min("hour").as("h0"), max("hour").as("h1"))
    val types = counts.select("event_type").distinct()
    val grid = types.crossJoin(broadcast(rng))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    grid.join(counts, Seq("event_type", "hour"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("l24", lag("n", 24).over(w))
      .withColumn("l1", lag("n", 1).over(w))
      .filter(col("l24").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum("n").as("total_events"),
        sum(abs(col("n") - col("l24"))).as("sae_seasonal"),
        sum(abs(col("n") - col("l1"))).as("sae_naive"))
      .select(col("event_type"), col("n_hours"), col("total_events"),
        col("sae_seasonal"), col("sae_naive"),
        ratio4(col("sae_seasonal"), col("n_hours")).as("mae4"),
        ratio4(col("sae_seasonal"), greatest(col("sae_naive"), lit(1L))).as("mase4"))
      .orderBy("event_type")
  }
}
