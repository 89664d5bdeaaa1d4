package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 time-series locators: the offline CUSUM changepoint
  * (WHERE did the level move, and by how much) and the Theil–Sen
  * robust trend (the median-slope twin of the OLS line). Both grade
  * the same daily substrate the trend/drift family reads
  * (reference semantics: the event stream of deduplication.ts:11-40,
  * aggregated); both keep the repo's exact-rational discipline — every
  * ranking/median selection runs on integers (or fixed-scale integer
  * keys with a proven no-false-tie bound), never on float comparisons.
  */
object Analytics8 {

  /** Fixed-point scale for the Theil–Sen slope ORDER key:
    * floor(|Δy|·10⁷ / Δx), sign re-applied. Distinct slope rationals
    * with day-denominators ≤ D differ by ≥ 1/D², so the scaled gap is
    * ≥ 10⁷/D² — strictly > 1 (no false key tie) for any corpus span up
    * to D ≈ 3100 days (~8.5 years); equal rationals reduce to equal
    * keys by the reduced-form argument (floor(m·p·K/(m·q)) =
    * floor(p·K/q)). The key is therefore an EXACT total order on the
    * slope values at any realistic span, in pure int64. */
  val SlopeKeyScale: Long = 10000000L

  /** Signed ratio4 release with the numerator promoted to
    * DECIMAL(38,0) — same (2n+d) DIV 2d halfUp as
    * [[Analytics6.trendOlsOfDaily]]'s signed4 (proof of rounding
    * equivalence there); `num`/`den` are COLUMN NAMES resolved in the
    * frame. */
  private def signed4(numName: String, denName: String): Column = {
    val q = expr(s"""CAST((2 * CAST(abs($numName) AS DECIMAL(38,0)) * 10000
      |  + CAST($denName AS DECIMAL(38,0)))
      |  DIV (2 * CAST($denName AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
    when(col(denName) === 0L, lit(null).cast("double"))
      .otherwise(when(col(numName) < 0L, lit(-1.0)).otherwise(lit(1.0)) *
        (q / lit(10000.0)))
  }

  /** `events_changepoint`: per event type, the Taylor-style offline
    * CUSUM changepoint of DAILY VOLUME — the split k of the dense
    * daily-count series maximizing |n·S₁(k) − k·S| (the cumulative
    * sum's peak deviation from its expected line; ties → earliest
    * day). The family's missing locator: cusumDrift (#214) monitors
    * "something moved" online, this answers WHERE it moved and by how
    * much, with both segment means and the split's explained share of
    * total variance. The dense grid (empty days count 0, same
    * discipline as fanoSpectrum) is what makes a traffic outage a
    * level shift instead of a missing row.
    *
    * Exact algebra: the argmax key g = |n·S₁ − k·S| is pure int64
    * (n·S ≤ span-days × corpus-events ≈ 2e13 even at sf1000); g is
    * ALSO the between-segment sum-of-squares numerator (n₂S₁ − n₁S₂ =
    * n·S₁ − n₁·S), so the released gain_ppm = g²·10⁶ / (n₁·n₂·T) with
    * T = n·Σc² − S² is the split's explained variance share — g² and
    * n₁n₂T outgrow int64, so that one ratio runs in DECIMAL(38,0)
    * (DuckDB HUGEINT), halfUp to ppm, NULL on a constant series.
    *
    * Shape at scale: ONE map-side-combinable (type, day) count
    * aggregate over the scan; everything after lives on the
    * O(types × span-days) dense grid — the 1-row span broadcasts, the
    * cumulative window partitions by type, output O(types). */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.intDiv
    changepointOfDaily(Dedup.eventsUs(spark, dir)
      .select(col("event_type"),
        intDiv(col("ts_us"), lit(86400000000L)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c")))
  }

  /** [[changepoint]]'s algebra over an already-aggregated
    * (event_type, day, c) counts frame — ONE definition, two runtimes:
    * the batch query aggregates raw events; the streaming monitor
    * ([[graft.streaming.StreamChangepoint]]) maintains the daily
    * counts as ℤ-group deltas and evaluates THIS on the folded state
    * (counts are distributive, so stream ≡ batch exactly — the
    * [[Analytics6.trendOlsOfDaily]] discipline). */
  def changepointOfDaily(dailyIn: DataFrame): DataFrame = {
    import graft.functions.Hashing.ratio4
    val daily = dailyIn.localCheckpoint(true)
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("c"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val st = dense.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
    dense
      .withColumn("rn", row_number().over(byDay).cast("long"))
      .withColumn("s1", sum("c").over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(st, Seq("event_type"))
      .filter(col("rn") < col("n"))
      // signed between-SS numerator; |dnum| is the CUSUM peak key
      .withColumn("dnum", col("n") * col("s1") - col("rn") * col("s"))
      .withColumn("g", abs(col("dnum")))
      .withColumn("pick",
        row_number().over(Window.partitionBy("event_type")
          .orderBy(col("g").desc, col("day"))))
      .filter(col("pick") === 1)
      .withColumn("n1", col("rn"))
      .withColumn("n2", col("n") - col("rn"))
      // explained-variance share, DECIMAL(38,0) end to end: g² ≤ 4e26
      // and n₁n₂T ≤ 1e24 at sf100 both clear int64 but sit inside 38
      // digits with the ×10⁶ ppm scale
      .withColumn("bt", expr("""CAST(n1 AS DECIMAL(38,0)) * n2 *
        |(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s AS DECIMAL(38,0)) * s)"""
        .stripMargin))
      .withColumn("gain_ppm", expr(
        """CASE WHEN bt = 0 THEN NULL
          |ELSE CAST((2 * CAST(g AS DECIMAL(38,0)) * g * 1000000 + bt)
          |  DIV (2 * bt) AS BIGINT) END""".stripMargin))
      .select(col("event_type"), col("n").as("n_days"),
        col("s").as("n_events"), (col("day") + 1L).as("split_day"),
        col("n1").as("n_left"), col("n2").as("n_right"),
        ratio4(col("s1"), col("n1")).as("mean_left4"),
        ratio4(col("s") - col("s1"), col("n2")).as("mean_right4"),
        col("g").as("cusum_peak"), col("gain_ppm"))
      .orderBy("event_type")
  }

  /** `events_friedman_dow`: nonparametric day-of-week effect strength
    * — per event type, the Friedman rank statistic over complete
    * Monday-aligned weeks: within each week the 7 daily counts are
    * ranked (ties → average rank), and Q = 12/(nk(k+1))·ΣR_j² −
    * 3n(k+1) measures how consistently the dows order across weeks
    * (Q ≈ 0 = no weekly rhythm; large Q = a stable rhythm — the
    * rank-based, outlier-proof companion to the mean-based
    * seasonality panel #137: one viral day can fake a mean dow
    * effect, it cannot fake a rank that repeats every week). Also
    * released: the busiest dow by total rank and its mean rank.
    *
    * Exactness: average ranks are half-integers, so everything runs
    * on DOUBLED ranks (rank2 = 2·rank(min) + ties − 1, pure int64 —
    * rank()/count() windows, no floats); Q rewrites to the exact
    * rational (3·ΣR2² − 3n²k(k+1)²)/(n·k·(k+1)), non-negative by
    * Cauchy–Schwarz (total rank mass per week is invariant), one
    * halfUp ratio4. Weeks use the heatmap's (day+3) convention
    * (dow 0 = Monday); partial boundary weeks are excluded — a
    * 5-day week would rank against missing days.
    *
    * Shape: ONE map-side-combinable (type, day) count aggregate;
    * the dense week grid, ranking windows and rollups all live on
    * O(types × weeks × 7) rows. */
  def friedmanDow(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.intDiv
    friedmanDowOfDaily(Dedup.eventsUs(spark, dir)
      .select(col("event_type"),
        intDiv(col("ts_us"), lit(86400000000L)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c")))
  }

  /** [[friedmanDow]]'s algebra over an already-aggregated
    * (event_type, day, c) counts frame — the SAME daily-count
    * substrate [[changepointOfDaily]] reads, so the streaming monitor
    * ([[graft.streaming.StreamChangepoint]]) evaluates BOTH panels
    * from one TxnParquet delta log (one state, two rhythm readings:
    * where the level moved, and whether the weekly rhythm holds). */
  def friedmanDowOfDaily(dailyIn: DataFrame): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    val daily = dailyIn.localCheckpoint(true)
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"),
        col("d0"), col("d1"))
      .withColumn("wk", intDiv(col("day") + 3L, lit(7L)))
      // complete Monday-aligned weeks only: all 7 days inside the span
      .filter(col("wk") * 7L - 3L >= col("d0") &&
        col("wk") * 7L + 3L <= col("d1"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("wk"),
        ((col("day") + 3L) % 7L).as("dow"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wRank = Window.partitionBy("event_type", "wk").orderBy("c")
    val wTies = Window.partitionBy("event_type", "wk", "c")
    val ranked = dense
      .withColumn("rank2",
        rank().over(wRank).cast("long") * 2L +
          count(lit(1)).over(wTies) - 1L)
    val perDow = ranked.groupBy("event_type", "dow")
      .agg(sum("rank2").as("r2"), countDistinct("wk").as("n_weeks"))
    perDow.groupBy("event_type")
      .agg(max("n_weeks").as("n_weeks"),
        sum(col("r2") * col("r2")).as("sr2sq"),
        min(struct((-col("r2")).as("nr2"), col("dow"))).as("m"))
      .filter(col("n_weeks") > 0L)
      .select(col("event_type"), col("n_weeks"),
        ratio4(lit(3L) * col("sr2sq") -
            lit(1344L) * col("n_weeks") * col("n_weeks"),
          lit(56L) * col("n_weeks")).as("friedman_q4"),
        col("m.dow").as("top_dow"),
        ratio4(-col("m.nr2"), lit(2L) * col("n_weeks")).as("top_mean_rank4"))
      .orderBy("event_type")
  }

  /** `events_theil_sen`: per event type, the Theil–Sen ROBUST trend of
    * daily spend — median of all pairwise slopes (y_j−y_i)/(x_j−x_i)
    * over the observed (day, cents) points, plus the matching median
    * residual intercept. The robust member of the trend family: OLS
    * (#338/#346) is leverage-sensitive — one promo day drags the line;
    * the median slope has a 29.3% breakdown point and is what a mix
    * planner should read when spend has heavy days.
    *
    * Exactness: pairwise slopes are rationals (Δcents, Δdays); the
    * median is selected by ordering on the [[SlopeKeyScale]] int64 key
    * (exact total order, proof at the constant), taking the LOWER
    * median (rank (m+1) div 2 — deterministic, documented). The
    * intercept re-uses the chosen slope p/q: residuals y_i − (p/q)x_i
    * order exactly by their integer numerators q·y_i − p·x_i (q
    * constant per type), lower median again, released as the signed
    * decimal ratio4 of (numerator, q). Every released value is a
    * function of the underlying RATIONAL only, so representation
    * ties ((p,q) vs (2p,2q)) cannot flip a bit.
    *
    * Shape at scale: the (type, day) cents aggregate is one map-side
    * combinable pass over the scan; pairs are a self-join of the
    * O(types × days) daily frame — O(types × days²) ≈ 10⁵ rows at any
    * SF (days grow with the calendar, not the corpus), so the
    * quadratic lives on the aggregate grain where it is free. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{intDiv, valueCents}
    val daily = Dedup.eventsUs(spark, dir)
      .select(col("event_type"),
        intDiv(col("ts_us"), lit(86400000000L)).as("day"),
        valueCents(col("value")).as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("y"))
      .localCheckpoint(true)
    val day0 = daily.agg(min("day").as("day0"))
    val pts = daily.crossJoin(broadcast(day0))
      .select(col("event_type"), (col("day") - col("day0")).as("x"), col("y"))
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.event_type") === col("b.event_type") && col("b.x") > col("a.x"))
      .select(col("a.event_type").as("event_type"),
        (col("b.y") - col("a.y")).as("num"), (col("b.x") - col("a.x")).as("den"))
      .withColumn("key",
        when(col("num") < 0L, lit(-1L)).otherwise(lit(1L)) *
          graft.functions.Hashing.intDiv(
            abs(col("num")) * lit(SlopeKeyScale), col("den")))
    val m = pairs.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    val slope = pairs
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("key"), col("num"), col("den"))).cast("long"))
      .join(m, Seq("event_type"))
      .filter(col("rk") === graft.functions.Hashing.intDiv(
        col("n_pairs") + 1L, lit(2L)))
      .select(col("event_type"), col("n_pairs"),
        col("num").as("p"), col("den").as("q"))
      .localCheckpoint(true)
    val resid = pts.join(slope, Seq("event_type"))
      // integer residual numerator over the constant denominator q:
      // q·y − p·x stays < 9.2e14 up to ~sf100 daily-cents magnitudes,
      // and the ratio releases through the DECIMAL signed4 regardless
      .withColumn("rnum", col("q") * col("y") - col("p") * col("x"))
    val nd = pts.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    resid
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("rnum"), col("x"))).cast("long"))
      .join(nd, Seq("event_type"))
      .filter(col("rk") === graft.functions.Hashing.intDiv(
        col("n_days") + 1L, lit(2L)))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        signed4("p", "q").as("slope_cents"),
        signed4("rnum", "q").as("icept_cents"))
      .orderBy("event_type")
  }
}
