package graft.operators

import graft.Partitioning._
import graft.Tables
import graft.functions.Hashing.{intDiv, valueCents}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream panels beyond the Analytics1-3 tiers: distribution
  * histogram, period-over-period deltas, and last-touch attribution.
  * All value math stays in exact integer cents / µs.
  */
object Analytics4 {

  /** Histogram bucket width: $20 in cents. */
  val HistBucketCents = 2000L

  /** Fixed-width value histogram per event type — the distribution
    * panel next to the quantile/anomaly reports. Bucketing is exact
    * integer division on cents; both engines truncate toward zero
    * (Spark IntegralDivide and DuckDB `//` — verified on negative
    * fixtures in Analytics4Spec), so even a negative cent value (the
    * value ≥ 0 contract is monitored, not enforced, by dq_report)
    * buckets identically across engines. One partial-aggregable
    * shuffle on (type, bucket), output is O(types × occupied
    * buckets). */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Dedup.eventsUs(spark, dir)
      .select(col("event_type"), valueCents(col("value")).as("cents"))
      .groupBy(col("event_type"), intDiv(col("cents"), lit(HistBucketCents)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .orderBy("event_type", "bucket")

  /** Hour-over-hour movement per event type: hourly count + exact cents
    * sum, with the previous OBSERVED hour's count and the delta (the
    * lag skips empty hours — sparse grain, no zero-fill scan). The lag
    * window runs over the hourly AGGREGATE (O(types × hours) rows), so
    * its per-type partitions are trivially small at any input scale. */
  def hourlyChange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
    Dedup.eventsUs(spark, dir)
      .select(col("event_type"), expr("ts_us div 3600000000L").as("hour"),
        valueCents(col("value")).as("cents"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .withColumn("prev_n", coalesce(lag("n", 1).over(w), lit(0L)))
      .withColumn("delta_n", col("n") - col("prev_n"))
      .orderBy("event_type", "hour")
  }

  /** Benford first-digit expectation, round(log10(1 + 1/d)·10⁶) ppm
    * for d = 1…9 — the standard published table; the nine entries sum
    * to exactly 1,000,000, so the engine carries them as fixed int64
    * literals (no libm at query time). */
  val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  /** `events_benford`: the first-digit audit — per (event_type, digit
    * 1–9), how many positive cent values lead with that digit, the
    * exact ppm share within the type, the Benford expectation, and the
    * absolute deviation. Organic transaction amounts spanning several
    * orders of magnitude track Benford closely; a synthetic or
    * manipulated feed (fixed price points, fabricated rows) shows up
    * as large dev_ppm concentrated on a few digits — the classic
    * forensic-accounting screen, applied as a data-quality gate.
    *
    * Shape: leading digit via one string head over the cents int (no
    * log10 — engines' libm may differ in the last ulp near decade
    * boundaries); ONE partial-aggregable (type, digit) count shuffle;
    * the dense 9-digit grid and Benford constants join at O(types·9)
    * rows. Missing digits emit n = 0 rows so the panel's shape is
    * fixed. */
  /** The count stage of [[benford]] over any events frame with
    * (event_type, value) — per (type, leading digit of the positive
    * cents), the row count. Works unchanged as a streaming grouped
    * aggregation (counts are pure functions of the input set), which
    * is how [[graft.streaming.StreamQuality.benfordCounts]] runs it. */
  def firstDigitCounts(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), valueCents(col("value")).as("cents"))
      .filter(col("cents") > 0)
      .select(col("event_type"),
        substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("event_type", "digit").agg(count(lit(1)).as("n"))

  def benford(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.halfUpDiv
    val counts = firstDigitCounts(Dedup.eventsUs(spark, dir))
    val totals = counts.groupBy("event_type").agg(sum("n").as("total"))
    val digitBen = spark.range(1, 10).select(
      col("id").as("digit"),
      element_at(array(BenfordPpm.map(lit): _*), col("id").cast("int"))
        .as("benford_ppm"))
    totals.crossJoin(broadcast(digitBen))
      .join(counts, Seq("event_type", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("share_ppm", halfUpDiv(col("n") * 1000000L, col("total")))
      .select(col("event_type"), col("digit"), col("n"), col("share_ppm"),
        col("benford_ppm"),
        abs(col("share_ppm") - col("benford_ppm")).as("dev_ppm"))
      .orderBy("event_type", "digit")
  }

  /** Top event-type trigram paths: the `topN` most frequent 3-step
    * event-type sequences across user timelines (the path-mining
    * summary behind funnel design). Two lead windows ride ONE user_id
    * shuffle; the path space is tiny (|types|³), so the count
    * aggregation is map-side-combinable and the head is a TakeOrdered.
    * Ties at the boundary break by path string — total order. */
  def topPaths(spark: SparkSession, dir: String, topN: Int = 10): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Dedup.eventsUs(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type")
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topN)
  }

  /** Per-user lifetime spend with exact global rank and decile.
    * Ranking uses [[Ranking.globalRowNumber]] (range-partitioned sort +
    * partition-offset indices) — never a single-partition window, so
    * the report holds at any user cardinality. decile = (rn−1)·10 div
    * N + 1 in pure int64 (NOT SQL ntile — this floor form is one
    * integer expression both engines compute identically). */
  def spendDeciles(spark: SparkSession, dir: String): DataFrame = {
    // report-grain aggregate, materialized once: count(), zipWithIndex's
    // internal count job, and the final pass would otherwise each
    // re-aggregate the raw events (3 scans)
    val spend = Dedup.eventsUs(spark, dir)
      .groupBy("user_id").agg(sum(valueCents(col("value"))).as("spend_cents"))
      .checkpointSer
    val n = spend.count() // one scalar job; the denominator of the decile formula
    Ranking.globalRowNumber(spend, Seq(col("spend_cents").desc, col("user_id")))
      .select(col("user_id"), col("spend_cents"), col("rn"),
        (intDiv((col("rn") - 1L) * 10L, lit(n)) + 1L).as("decile"))
      .orderBy("user_id")
  }

  /** #173 `events_value_concentration`: the Lorenz/Pareto revenue-
    * concentration panel over [[spendDeciles]] — per spend decile
    * (1 = highest spenders): users, exact decile cents, and the
    * cumulative user/spend shares, answering "what share of revenue do
    * the top 10/20/…% of users hold" (the whale-risk number every
    * usage dashboard leads with). Rides the decile frame (same rank,
    * same materialized aggregate), collapses it to O(10) rows with one
    * partial-aggregable shuffle; the cumulative window and 1-row total
    * broadcast run on the 10-row aggregate, never the user table —
    * the sparse-window-over-aggregate discipline. Shares are ratio4
    * (exact half-up 1e-4), cents exact int64. */
  def valueConcentration(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.ratio4
    val d = spendDeciles(spark, dir)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("spend_cents").as("decile_cents"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.agg(sum("n_users").as("tu"), sum("decile_cents").as("tc"))
    d.withColumn("cum_users", sum("n_users").over(w))
      .withColumn("cum_cents", sum("decile_cents").over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"), col("decile_cents"),
        col("cum_cents"),
        ratio4(col("cum_users"), col("tu")).as("user_share"),
        ratio4(col("cum_cents"), col("tc")).as("spend_share"))
      .orderBy("decile")
  }

  /** Session-size histogram: how many sessions have exactly n events —
    * the engagement-depth panel next to DAU/WAU. Rides sessionIndexed's
    * single user_id window pipeline; both aggregations partial-combine. */
  def sessionHistogram(spark: SparkSession, dir: String,
                       gapUs: Long = 1800L * 1000000L): DataFrame =
    // rides the CANONICAL per-session frame (one "session size"
    // definition in the library); the unused money/bounds aggregates
    // and the inner sort are pruned by Catalyst
    Analytics.sessionize(spark, dir, gapUs)
      .groupBy("n_events").agg(count(lit(1)).as("n_sessions"))
      .orderBy("n_events")

  /** Trailing-7-day revenue per event type on the daily aggregate via
    * a RANGE frame over the integer day (gaps in sparse days are
    * handled by the frame bound itself — no zero-fill, no explode).
    * The window runs over O(types × days) aggregate rows, so per-type
    * partitions stay trivial at any input scale. Exact integer cents. */
  def rollingWeek(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    Dedup.eventsUs(spark, dir)
      .select(col("event_type"), expr("ts_us div 86400000000L").as("day"),
        valueCents(col("value")).as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("cents").as("day_cents"))
      .withColumn("w7_n", sum("n").over(w))
      .withColumn("w7_cents", sum("day_cents").over(w))
      .orderBy("event_type", "day")
  }

  /** Rank-based trim: drop this percent of rows from EACH end. */
  val TrimPct = 5L

  /** Robust per-type mean: the mean of values after dropping the
    * lowest and highest `TrimPct`% of ROWS (k = n·pct div 100 — pure
    * integer trim counts, unlike percentile-threshold trimming whose
    * 0.05 interpolation position is not a binary-exact fraction).
    * Row-rank trimming over (cents, event_id) is a total order, the
    * kept-range boundaries are exact ints, and the mean rides ratio4 —
    * bit-reproducible end to end. Both windows share the event_type
    * exchange. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("event_type").orderBy("cents", "event_id")
    val wAll = Window.partitionBy("event_type")
    Dedup.eventsUs(spark, dir)
      .select(col("event_type"), valueCents(col("value")).as("cents"), col("event_id"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("k", intDiv(col("n") * TrimPct, lit(100L)))
      .filter(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), min("cents").as("lo_cents"),
        max("cents").as("hi_cents"), sum("cents").as("sum_cents"))
      .select(col("event_type"), col("n_kept"), col("lo_cents"), col("hi_cents"),
        graft.functions.Hashing.ratio4(col("sum_cents"), col("n_kept")).as("mean_cents"))
      .orderBy("event_type")
  }

  /** Column-profiling report over the events stream (the ANALYZE TABLE
    * shape): per column, null count and exact distinct count, long
    * format. One aggregation pass — Spark plans the multi-distinct as
    * a single expand-based aggregate, so the table is scanned once. */
  def profileEvents(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
      countDistinct(col(c)).as(s"dist_$c")))
    val one = Dedup.eventsUs(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c => s"'$c', null_$c, dist_$c").mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${cols.size}, $stack) AS (column_name, n_null, n_distinct)")
      .select("column_name", "n_rows", "n_null", "n_distinct")
      .orderBy("column_name")
  }

  /** RFM quintile segmentation: per user, recency (last activity),
    * frequency (event count) and monetary (exact cents spend), each
    * scored 1–5 by EXACT global rank — three [[Ranking.globalRowNumber]]
    * passes over the per-user aggregate, never a single-partition
    * window. Quintile = (N−rn)·5 div N + 1 in pure int64 (the decile
    * discipline); higher score = better (more recent / more frequent /
    * higher spend), ties broken by user_id — total order, so the
    * segmentation reproduces bit-for-bit anywhere. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.eventsUs(spark, dir)
      .groupBy("user_id")
      .agg(max("ts_us").as("last_us"), count(lit(1)).as("n_events"),
        sum(valueCents(col("value"))).as("spend_cents"))
      .checkpointSer // three rank passes + count read it
    val n = base.count()
    // each dimension ranks the CHECKPOINTED base independently (a chain
    // of rank passes would re-execute the prior pass's sort + row
    // re-encode inside every zipWithIndex count job), then the three
    // score frames join back on user_id
    def score(sortCol: org.apache.spark.sql.Column, out: String) =
      Ranking.globalRowNumber(base, Seq(sortCol.desc, col("user_id")), "rn")
        .select(col("user_id"),
          (intDiv((lit(n) - col("rn")) * 5L, lit(n)) + 1L).as(out))
    base
      .join(score(col("last_us"), "r_score"), "user_id")
      .join(score(col("n_events"), "f_score"), "user_id")
      .join(score(col("spend_cents"), "m_score"), "user_id")
      .select("user_id", "last_us", "n_events", "spend_cents",
        "r_score", "f_score", "m_score")
      .orderBy("user_id")
  }

  /** `events_rfm_migration`: period-over-period value-segment
    * migration — the longitudinal companion of [[rfm]]. The corpus
    * splits at its temporal midpoint (pure int64: mn + (mx−mn) div 2,
    * an O(1) driver aggregate like the Lloyd/whitening model-state
    * collects); each half M-quintile-scores its users independently
    * (exact global rank on cents spend — the same
    * [[Ranking.globalRowNumber]] discipline as rfm, never a
    * single-partition window), and the output is the 6×6 transition
    * matrix with segment 0 = absent from that half (new users enter
    * via row 0, churned users exit via column 0). The "did our
    * high-value users stay high-value" panel a retention review reads.
    *
    * Shape: two per-user aggregates + two O(users) rank passes; the
    * full-outer join is user-keyed; output ≤ 36 rows. */
  def rfmMigration(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir).select("user_id", "ts_us", "value")
    val b = ev.agg(min("ts_us").as("mn"), max("ts_us").as("mx")).head()
    val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    def seg(period: DataFrame, out: String) = {
      val base = period.groupBy("user_id")
        .agg(sum(valueCents(col("value"))).as("cents"))
        .checkpointSer // the rank pass and the count both read it
      val n = base.count()
      Ranking.globalRowNumber(base, Seq(col("cents").desc, col("user_id")), "rn")
        .select(col("user_id"),
          (intDiv((lit(n) - col("rn")) * 5L, lit(n)) + 1L).as(out))
    }
    val a = seg(ev.filter(col("ts_us") < mid), "seg_a")
    val bb = seg(ev.filter(col("ts_us") >= mid), "seg_b")
    a.join(bb, Seq("user_id"), "full_outer")
      .select(coalesce(col("seg_a"), lit(0L)).as("seg_a"),
        coalesce(col("seg_b"), lit(0L)).as("seg_b"))
      .groupBy("seg_a", "seg_b").agg(count(lit(1)).as("n_users"))
      .orderBy("seg_a", "seg_b")
  }

  /** Attribution lookback: one hour in µs. */
  val AttributionWindowUs = 3600L * 1000000L

  /** Last-touch attribution: each purchase is attributed to the same
    * user's most recent click at or before it, if within the lookback
    * window. One user-partitioned window pass carries the latest click
    * (id, ts) forward — the as-of union-scan shape: no range join, no
    * per-user nested loop, one shuffle on user_id. Ordering is the
    * total (ts_us, event_id) order, so ties are deterministic on any
    * engine. Purchases with no qualifying click are omitted (they'd be
    * the "organic" bucket). */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val click = (c: String) =>
      last(when(col("event_type") === "click", col(c)), ignoreNulls = true).over(w)
    Dedup.eventsUs(spark, dir)
      .select("event_id", "ts_us", "user_id", "event_type")
      .withColumn("click_id", click("event_id"))
      .withColumn("click_ts", click("ts_us"))
      .filter(col("event_type") === "purchase" && col("click_ts").isNotNull &&
        col("ts_us") - col("click_ts") <= AttributionWindowUs)
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts_us") - col("click_ts")).as("gap_us"))
      .orderBy("event_id")
  }

  /** One hour in µs — the grain [[burstiness]] counts on. */
  val HourUs = 3600000000L

  /** One calendar-free week in µs — [[typeDrift]]'s comparison grain. */
  val WeekUs = 7L * 86400000000L

  /** `events_burstiness`: per-user Fano factor of hourly event counts
    * over the corpus observation window — the DISPERSION companion to
    * `events_bot_regularity` (#177 reads gap variance; THIS reads
    * count dispersion): Fano = var/mean of the user's per-hour counts
    * across ALL H observed hours (zero hours included — they are what
    * distinguishes bursty from steady). Fano ≈ 1 is Poisson-like
    * human arrival; ≪ 1 is metronome-regular (bots); ≫ 1 is bursty
    * (sessions, scripted batches). Exact int64 end to end:
    * var/mean = (H·Σc² − n²)/(H·n), exported as ratio4 — the
    * numerator is ≥ 0 by Cauchy–Schwarz, so halfUp stays in the
    * floor==trunc regime on both engines.
    *
    * Shape: one (user, hour) keyed count, one user rollup (both
    * partial-aggregable), the 1-row hour span broadcast. O(users)
    * output. */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.ratio4
    val hours = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), intDiv(col("ts_us"), lit(HourUs)).as("hour"))
    val cells = hours.groupBy("user_id", "hour").agg(count(lit(1)).as("c"))
    val span = hours.agg((max("hour") - min("hour") + 1L).as("h"))
    cells.groupBy("user_id")
      .agg(sum("c").as("n_events"), count(lit(1)).as("n_active_hours"),
        sum(col("c") * col("c")).as("s2"))
      .crossJoin(broadcast(span))
      .select(col("user_id"), col("n_events"), col("n_active_hours"),
        ratio4(col("h") * col("s2") - col("n_events") * col("n_events"),
          col("h") * col("n_events")).as("fano4"))
      .orderBy("user_id")
  }

  /** `events_type_drift`: week-over-week event-type mix shift — per
    * week (except the first), the L1 distance between this week's and
    * the previous week's type distribution in exact ppm, plus the
    * single type that moved most (the headline a drift alert prints).
    * The behavioral-mix twin of `events_cusum_drift` (#214 watches a
    * LEVEL; this watches the COMPOSITION): a product launch, a bot
    * campaign or an instrumentation change all show as an L1 spike
    * with the culprit type named.
    *
    * Shape: one (week, type) keyed count, ppm against the week total,
    * zero-filled over the dense O(weeks·types) grid built FROM THE
    * AGGREGATE (absent cells must contribute their full ppm to the
    * L1, not vanish), one lag window per type over aggregate rows.
    * Nothing touches raw events twice. */
  def typeDrift(spark: SparkSession, dir: String): DataFrame =
    typeDriftOfCounts(
      Dedup.eventsUs(spark, dir)
        .select(intDiv(col("ts_us"), lit(WeekUs)).as("week"), col("event_type"))
        .groupBy("week", "event_type").agg(count(lit(1)).as("c"))
        .localCheckpoint())

  /** [[typeDrift]]'s algebra over an already-aggregated
    * (week, event_type, c) frame — ONE definition, two runtimes: the
    * batch query aggregates raw events; the streaming monitor
    * ([[graft.streaming.StreamDrift.weeklyTypeCounts]]) maintains the
    * same counts incrementally and a reviewer derives the identical
    * drift table from the sink. */
  def typeDriftOfCounts(wk: DataFrame): DataFrame = {
    import graft.functions.Hashing.halfUpDiv
    val tot = wk.groupBy("week").agg(sum("c").as("t"))
    val ppm = wk.join(tot, "week")
      .select(col("week"), col("event_type"),
        halfUpDiv(col("c") * 1000000L, col("t")).as("ppm"))
    val grid = wk.select("week").distinct()
      .crossJoin(broadcast(wk.select("event_type").distinct()))
    val w = Window.partitionBy("event_type").orderBy("week")
    val diffs = grid.join(ppm, Seq("week", "event_type"), "left")
      .withColumn("ppm", coalesce(col("ppm"), lit(0L)))
      .withColumn("prev", lag("ppm", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("d", abs(col("ppm") - col("prev")))
    diffs.groupBy("week")
      .agg(sum("d").as("l1_ppm"),
        max(struct(col("d"), col("event_type"))).as("m"))
      .select(col("week"), col("l1_ppm"),
        col("m.event_type").as("top_mover"), col("m.d").as("top_delta_ppm"))
      .orderBy("week")
  }

  /** `customer_revenue_gini`: revenue concentration across CUSTOMERS,
    * per market segment — the commerce member of the concentration
    * family (#173 grades event spend per user decile; #232 grades
    * token mass per term; this is the Lorenz/Gini number an account
    * team reads: does one whale carry the segment). Released per
    * segment: customer count, total cents, the exact population Gini,
    * and the top-decile revenue share.
    *
    * Exactness: per-customer revenue is the money-suite decimal sum
    * rounded once to cents; Gini uses the sorted-rank identity
    * G = (2·Σ i·vᵢ − (n+1)·Σv)/(n·Σv) with i = ascending within-
    * segment rank — Σ i·v outgrows int64 at commerce magnitudes, so
    * the moment and both releases run in DECIMAL(38,0)/HUGEINT (the
    * (2n+d) DIV 2d halfUp form); the numerator is ≥ 0 because rank
    * and value sort together.
    *
    * Shape at scale: the within-segment rank comes from ONE native
    * GlobalRank over (segment, cents, cust) minus a broadcast
    * O(segments) offset — never a per-segment window sort over the
    * customer table; one partial-aggregable rollup ends at
    * O(segments) rows. */
  def revenueGini(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.intDiv
    val rev0 = (col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1.0).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), rev0.as("rev"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "l_orderkey")
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey").as("cust"))
      .agg(round(sum("rev") * 100, 0).cast("long").as("cents"))
      .checkpointSer
    val ranked = Ranking.globalRowNumber(rev,
      Seq(col("segment"), col("cents"), col("cust")), "grn")
    val offs = ranked.groupBy("segment")
      .agg((min("grn") - 1L).as("off"), count(lit(1)).as("n"))
    ranked.join(broadcast(offs), "segment")
      .withColumn("rnk", col("grn") - col("off"))
      .groupBy("segment")
      .agg(max("n").as("n"), sum("cents").as("sv"),
        sum(expr("CAST(rnk AS DECIMAL(38,0)) * cents")).as("siv"),
        sum(when(col("rnk") > intDiv(lit(9L) * col("n"), lit(10L)),
          col("cents")).otherwise(0L)).as("topv"))
      .select(col("segment"), col("n").as("n_customers"),
        col("sv").as("total_cents"),
        expr("""CASE WHEN sv = 0 THEN NULL ELSE
          |CAST((2 * (2 * siv - (CAST(n AS DECIMAL(38,0)) + 1) * sv) * 10000
          |  + CAST(n AS DECIMAL(38,0)) * sv)
          |  DIV (2 * CAST(n AS DECIMAL(38,0)) * sv) AS BIGINT)
          |  / CAST(10000 AS DOUBLE) END""".stripMargin).as("gini4"),
        expr("""CASE WHEN sv = 0 THEN NULL ELSE
          |CAST((2 * CAST(topv AS DECIMAL(38,0)) * 10000
          |  + CAST(sv AS DECIMAL(38,0)))
          |  DIV (2 * CAST(sv AS DECIMAL(38,0))) AS BIGINT)
          |  / CAST(10000 AS DOUBLE) END""".stripMargin).as("top10_share4"))
      .orderBy("segment")
  }

  /** `orders_segment_trend`: per market segment, the exact-rational
    * OLS trend of MONTHLY discounted revenue — the commerce
    * application of the #338 trend algebra (the OLS panel is
    * substrate-generic: (key, time-index, int64 mass) in, slope/
    * intercept/r² out), answering "which segments grow vs decay" at
    * the grain a demand planner reads. Revenue is the money-suite
    * exact DECIMAL(18,4) sum per (segment, month) rounded once to
    * cents; month index = 12·year + month − 1, pure integer calendar
    * arithmetic. The cents magnitudes here are what forced the shared
    * release into DECIMAL(38,0) (Σy·Σx² passes int64 at commerce
    * scale).
    *
    * Shape: lineitem joins the two dimension-sized sides (orders
    * projected to key+date+cust broadcast-buildable at these SFs;
    * customer to key+segment), ONE (segment, month) partial-
    * aggregable rollup, then the O(segments) moment pass. */
  def segmentTrend(spark: SparkSession, dir: String): DataFrame = {
    val rev = (col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1.0).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
    val monthly = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), rev.as("rev"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("day")), "l_orderkey")
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
      .groupBy(col("c_mktsegment").as("event_type"), col("day"))
      .agg(round(sum("rev") * 100, 0).cast("long").as("y"))
    Analytics6.trendOlsOfDaily(monthly)
      .withColumnRenamed("event_type", "segment")
      .withColumnRenamed("n_days", "n_months")
  }
}
