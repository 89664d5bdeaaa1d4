package graft.operators

import graft.Partitioning._
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third tranche of analytics: the Q21 shape (the hardest TPC-H join
  * pattern), lag/lead gap analysis, and exact grouped quantiles.
  *
  * lineitem has no commit/receipt dates, so Q21's "late" predicate is
  * adapted to l_shipdate > o_orderdate + `lateDays` — the join/
  * correlation structure (the part that matters for planning) is
  * unchanged.
  */
object Analytics3 {

  /** Q21-style "suppliers who kept orders waiting": suppliers in one
    * region whose late line item was the ONLY late one in a
    * multi-supplier finished order.
    *
    * Planned as the aggregate rewrite, not correlated EXISTS/NOT
    * EXISTS: one pass over (order, supplier, late) computes per-order
    * supplier/late-supplier counts, and the winners fall out of a
    * join on the order key — lineitem is scanned once and shuffled
    * once on l_orderkey, versus the textbook form's two additional
    * correlated self-joins of the largest table. The DuckDB oracle
    * runs the textbook EXISTS form, so the hash-match proves the
    * rewrite. */
  def q21(spark: SparkSession, dir: String,
          lateDays: Int = 365, region: String = "ASIA"): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
    val nat = Tables.nation(spark, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    // (order, supplier) grain with the late flag — duplicates collapsed
    // here so downstream counts are supplier-level, not lineitem-level
    val os = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("late"))
    // per-order supplier/late counts as a WINDOW over the aggregate, not
    // a second aggregation subtree — a DataFrame branch would recompute
    // the whole lineitem scan+join+agg; the window rides the (order,
    // supplier) rows already in hand with one more orderkey exchange
    val wOrd = Window.partitionBy("l_orderkey")
    os.select(col("*"),
        count(lit(1)).over(wOrd).as("n_supp"),
        sum(when(col("late"), 1L).otherwise(0L)).over(wOrd).as("n_late"))
      .filter(col("late") && col("n_supp") >= 2 && col("n_late") === 1)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Gate and threshold for [[botRegularity]]: users with fewer gaps
    * aren't assessable; regularity at or below the threshold flags. */
  val MinGaps = 5L
  val BotRegularityMax = 0.2

  /** #177 `events_bot_regularity`: automated-traffic detection by
    * inter-event-gap REGULARITY — humans arrive bursty (gap dispersion
    * near the mean; an exponential arrival process has MAD/mean ≈
    * 0.74), schedulers and replay bots arrive metronomically
    * (dispersion near 0). Per user with ≥ [[MinGaps]] gaps: exact
    * integer mean gap (halfUp µs), exact mean absolute deviation
    * around that integer mean (MAD — deliberately NOT variance: |dev|
    * sums stay int64 at any event volume where gap² sums would
    * overflow), regularity = ratio4(MAD, mean), and the flag
    * (regularity ≤ [[BotRegularityMax]], or an all-identical-timestamp
    * user — mean 0, the degenerate perfectly-regular case, regularity
    * left NULL).
    *
    * One user_id shuffle end to end: the lag window, both aggregates
    * and the mean-join all ride the same hash partitioning (reused
    * exchange), so the second pass (deviations need the mean first —
    * inherent to any exact MAD) adds no new shuffle of the events. */
  def botRegularity(spark: SparkSession, dir: String): DataFrame =
    botRegularityOf(Dedup.eventsUs(spark, dir))

  /** [[botRegularity]] over any frame with (user_id, ts_us, event_id). */
  def botRegularityOf(ev: DataFrame): DataFrame =
    regularityOfGaps(gapsOf(ev))

  /** The per-user inter-event gap stream (user_id, gap) — the lag-window
    * stage of [[botRegularityOf]], exposed so the streaming twin
    * (streaming.StreamRegularity: one (ts, id) tuple of state per user)
    * can assert its emitted gap multiset equals this exactly. */
  def gapsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.select("user_id", "ts_us", "event_id")
      .withColumn("prev", lag("ts_us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("ts_us") - col("prev")).as("gap"))
  }

  /** The regularity panel over ANY (user_id, gap) frame — batch gaps
    * (the lag window) and accumulated streaming gaps produce identical
    * output, which is the parity contract StreamRegularitySpec pins. */
  def regularityOfGaps(gaps: DataFrame): DataFrame = {
    import graft.functions.Hashing.{halfUpDiv, ratio4}
    val m = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sum_gap"))
      .filter(col("n_gaps") >= MinGaps)
      .withColumn("mean_us", halfUpDiv(col("sum_gap"), col("n_gaps")))
    val dev = gaps.join(m.select("user_id", "mean_us"), "user_id")
      .groupBy("user_id")
      .agg(sum(abs(col("gap") - col("mean_us"))).as("sum_dev"))
    m.join(dev, "user_id")
      .withColumn("mad_us", halfUpDiv(col("sum_dev"), col("n_gaps")))
      .withColumn("regularity",
        when(col("mean_us") > 0L, ratio4(col("mad_us"), col("mean_us"))))
      .withColumn("is_bot",
        when(col("mean_us") === 0L, lit(true))
          .otherwise(col("regularity") <= lit(BotRegularityMax)))
      .select("user_id", "n_gaps", "mean_us", "mad_us", "regularity", "is_bot")
      .orderBy("user_id")
  }

  /** Human-scale gap buckets for [[gapHistogram]]: (rank, label,
    * exclusive upper bound in µs). The ladder is the SESSIONIZATION
    * evidence — the valley between the within-visit mass and the
    * between-visit mass is where the session gap belongs. */
  val GapBuckets: Seq[(Long, String, Long)] = Seq(
    (1L, "0",     1L),
    (2L, "<=1s",  1000000L),
    (3L, "<=10s", 10000000L),
    (4L, "<=60s", 60000000L),
    (5L, "<=5m",  300000000L),
    (6L, "<=30m", 1800000000L),
    (7L, "<=1h",  3600000000L),
    (8L, "<=6h",  21600000000L),
    (9L, "<=24h", 86400000000L))

  /** #196 `events_gap_histogram`: the inter-event gap distribution over
    * human-scale buckets — per bucket: gaps, exact ratio4 share, and
    * the cumulative share. This is the panel that JUSTIFIES the 30-min
    * sessionization gap (#24) and the 12-h visit gap (#105): real
    * traffic is bimodal (within-visit seconds vs between-visit hours)
    * and the chosen gap must sit in the valley; a corpus whose
    * histogram has no valley has no natural session boundary.
    *
    * Shape: the shared lag-window gap stage ([[gapsOf]] — one user_id
    * shuffle), a CASE-ladder bucket per row (exact integer boundary
    * compares — no float log binning whose edge rounding differs
    * across engines), one O(buckets) partial-aggregable rollup, the
    * cumulative window over the O(10) bucket rows only. */
  def gapHistogram(spark: SparkSession, dir: String): DataFrame =
    gapHistogramOf(gapsOf(Dedup.eventsUs(spark, dir)))

  /** [[gapHistogram]] over ANY (user_id, gap) frame — batch lag-window
    * gaps or the accumulated StreamRegularity gap stream produce the
    * identical panel (the same two-layer parity contract as
    * [[regularityOfGaps]]; StreamRegularitySpec pins it). */
  def gapHistogramOf(gaps: DataFrame): DataFrame = {
    import graft.functions.Hashing.ratio4
    val bucketRank = GapBuckets.reverse.foldLeft(
      lit(GapBuckets.length + 1L)) { case (acc, (r, _, ub)) =>
        when(col("gap") < ub, lit(r)).otherwise(acc)
      }
    val labelOf = GapBuckets.map { case (r, l, _) => (r, l) } :+
      ((GapBuckets.length + 1L, ">24h"))
    val labelCol = labelOf.reverse.foldLeft(lit(">24h"): Column) {
      case (acc, (r, l)) => when(col("bucket_rank") === r, lit(l)).otherwise(acc)
    }
    val cells = gaps
      .withColumn("bucket_rank", bucketRank)
      .groupBy("bucket_rank")
      .agg(count(lit(1)).as("n_gaps"))
      .localCheckpoint()
    val tot = cells.agg(sum("n_gaps").as("t"))
    val w = Window.orderBy("bucket_rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(tot))
      .withColumn("cum_gaps", sum("n_gaps").over(w))
      .select(col("bucket_rank"), labelCol.as("bucket"), col("n_gaps"),
        ratio4(col("n_gaps"), col("t")).as("share"),
        ratio4(col("cum_gaps"), col("t")).as("cum_share"))
      .orderBy("bucket_rank")
  }

  /** Inter-event gap statistics per user (lag window): gap count, sum
    * and max in exact integer µs, plus the mean as a rounded double.
    * One shuffle on user_id; the window and the aggregation share it. */
  def gapStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Dedup.eventsUs(spark, dir)
      .select("user_id", "ts_us", "event_id")
      .withColumn("prev", lag("ts_us", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap", col("ts_us") - col("prev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
           sum("gap").as("sum_gap_us"),
           max("gap").as("max_gap_us"),
           // exact-rational rounding (graft.functions.Hashing.ratio4):
           // round() over the double quotient diverged between engines
           graft.functions.Hashing.ratio4(sum("gap"), count(lit(1))).as("avg_gap_us"))
      .orderBy("user_id")
  }

  /** Corpus composition matrix: documents per source × language as a
    * PIVOT (fixed language universe → one aggregation, columns fan out
    * at plan time; absent cells are exact zeros). The per-source row is
    * what a curation dashboard reads to spot language skew by source. */
  def langPivot(spark: SparkSession, dir: String,
                langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
      .select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
      .orderBy("source")

  /** Tukey-fence value anomalies per event type: rows above
    * p75 + 3·(p75 − p25) of their type's value (in exact integer
    * cents). The fences ride [[Ranking.groupedQuantiles]] — binary-exact
    * positions make the boundary bit-identical across engines (no
    * mean/stddev floating-point edge) and the native GlobalRank path
    * never buffers a type's values on one reducer (tiny type
    * cardinality × huge population is exactly the shape the grouped
    * `percentile` aggregate OOMs on at 100×). Two passes over events
    * (fence quantiles ⋈ rows), fence table broadcast. */
  def valueAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir)
      .select(col("event_id"), col("event_type"),
        graft.functions.Hashing.valueCents(col("value")).as("cents"))
    val fences = Ranking.groupedQuantiles(ev, Seq("event_type"), "cents",
        Seq("event_id"), Seq(0.25, 0.75))
      .groupBy("event_type")
      .agg(max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.75, col("q"))).as("p75"))
      .select(col("event_type"),
        (col("p75") + lit(3.0) * (col("p75") - col("p25"))).as("fence"))
    ev.join(broadcast(fences), "event_type")
      .filter(col("cents") > col("fence"))
      .select("event_id", "event_type", "cents", "fence")
      .orderBy("event_id")
  }

  /** First-order transition counts between consecutive event types per
    * user (the Markov-chain statistics a behavioral model trains on),
    * with the per-from total riding a window over the aggregate so the
    * transition probability needs no second pass. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wFrom = Window.partitionBy("type_from")
    Dedup.eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("type_from"),
        lead("event_type", 1).over(w).as("type_to"))
      .filter(col("type_to").isNotNull)
      .groupBy("type_from", "type_to")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", graft.functions.Hashing.ratio4(col("n"), sum("n").over(wFrom)))
      .orderBy("type_from", "type_to")
  }

  /** Within-session event-type co-occurrence — the market-basket
    * shape: for every UNORDERED pair of event types (emitted once,
    * lexicographically ordered), in how many user-sessions both occur. Distinct (session, type) rows self-join
    * on the session key (groups are session-sized, never corpus-sized)
    * and aggregate; the session index rides Analytics.sessionIndexed's
    * single user_id window pipeline. */
  def cooccurrence(spark: SparkSession, dir: String,
                   gapUs: Long = 1800L * 1000000L): DataFrame = {
    val d = Analytics.sessionIndexed(spark, dir, gapUs)
      .select("user_id", "session_idx", "event_type")
      .distinct()
    d.as("a").join(d.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_idx") === col("b.session_idx") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("type_a", "type_b")
  }

  /** Sequential conversion funnel: users who viewed, then clicked
    * strictly after their first view, then purchased strictly after
    * that first qualifying click. Each stage is one type-filtered scan
    * (the filter pushes into parquet) aggregated to a per-user minimum
    * and joined on user_id — per-stage state is one timestamp per user,
    * and each later stage only scans its own event type. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir).select("user_id", "event_type", "ts_us")
    def stage(prev: DataFrame, eType: String, tsCol: String): DataFrame =
      ev.filter(col("event_type") === eType)
        .join(prev, "user_id")
        .filter(col("ts_us") > col(tsCol))
        .groupBy("user_id").agg(min("ts_us").as(s"t_$eType"))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val clicked = stage(viewed, "click", "t_view")
    val purchased = stage(clicked, "purchase", "t_click")
    viewed.agg(count(lit(1)).as("n_view"))
      .crossJoin(clicked.agg(count(lit(1)).as("n_click")))
      .crossJoin(purchased.agg(count(lit(1)).as("n_purchase")))
  }

  /** Cohort retention matrix: users grouped by first-active day, and
    * for each day offset 0..`maxOffset`, how many of that cohort were
    * active again. Two aggregations (first day per user, distinct
    * activity days) sharing the user_id shuffle, then one count per
    * (cohort, offset) cell. */
  /** One day in µs — the day grain every cohort/DAU panel shares. */
  val DayUs = 86400000000L

  /** Shared cohort scaffold over any per-(user_id, day) frame: cohort
    * day as a WINDOW over the frame (a cohort-aggregate branch joined
    * back would recompute the frame's whole upstream; the window costs
    * one user_id exchange), plus the bounded day offset. The retention
    * matrix and its monetary twin both ride this, so "cohort" has one
    * definition in the library. */
  def cohortOffsets(perUserDay: DataFrame, maxOffset: Int): DataFrame =
    perUserDay
      .withColumn("cohort_day",
        min("day").over(Window.partitionBy("user_id")))
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset") <= maxOffset)

  def retention(spark: SparkSession, dir: String, maxOffset: Int = 7): DataFrame = {
    val activity = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us div ${DayUs}L").as("day"))
      .distinct()
    cohortOffsets(activity, maxOffset)
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  /** Pattern sessions use a visit-scale 12-hour gap: the CEP question
    * ("did the funnel complete within one visit?") is about multi-event
    * windows, and the 30-min analytics gap yields near-singleton
    * sessions on this event density. */
  val PatternGapUs: Long = 12L * 3600L * 1000000L

  /** Ordered-subsequence pattern match within sessions (the
    * MATCH_RECOGNIZE / CEP shape): sessions containing a view, then a
    * click after some view, then a purchase after such a click. The
    * three-stage state machine runs as two cascaded window passes over
    * the session ordering — "a qualifying earlier row exists" is
    * max(flag) over ROWS UNBOUNDED PRECEDING..1 PRECEDING — so the
    * whole match shares sessionization's single user_id shuffle; no
    * joins, no per-session buffering. */
  def patternSessions(spark: SparkSession, dir: String,
                      gapUs: Long = PatternGapUs): DataFrame = {
    val w = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Analytics.sessionIndexed(spark, dir, gapUs)
      .select("user_id", "session_idx", "event_type", "ts_us", "event_id")
      .withColumn("saw_view",
        coalesce(max(when(col("event_type") === "view", 1).otherwise(0)).over(w), lit(0)))
      .withColumn("qual_click",
        when(col("event_type") === "click" && col("saw_view") === 1, 1).otherwise(0))
      .withColumn("saw_qclick", coalesce(max(col("qual_click")).over(w), lit(0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase" && col("saw_qclick") === 1, 1)
          .otherwise(0)).as("hit"))
      .filter(col("hit") === 1)
      .select("user_id", "session_idx", "n_events")
      .orderBy("user_id", "session_idx")
  }

  /** Daily / trailing-7-day active users and stickiness (DAU/WAU) per
    * day — the engagement panel. The distinct (user, day) activity
    * frame is computed once; WAU explodes each activity day onto the 7
    * report days it supports (a 7× fan-out of the DISTINCT frame,
    * never of raw events) and distincts again, so the plan is linear
    * and both counts are exact — no sliding distinct-over-window
    * state. Stickiness is the exact-rational ratio4. */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val act = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us div ${dayUs}L").as("day"))
      .distinct()
    val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = act
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        graft.functions.Hashing.ratio4(col("dau"), col("wau")).as("stickiness"))
      .orderBy("day")
  }

  /** #182 `events_user_flux`: the user-lifecycle flux panel next to
    * DAU/WAU and retention — per epoch day: distinct active users,
    * users whose FIRST-ever event lands that day (acquisition), users
    * whose LAST-ever event lands that day (the churn proxy: at the
    * corpus horizon these are the not-yet-returned), and the running
    * cumulative of first-days (= total users ever seen). Acquisition
    * spikes, churn waves and the install-base curve in one table.
    *
    * Shape: the distinct (user, day) activity frame computes once and
    * feeds BOTH the per-day active count and the per-user min/max-day
    * aggregate (user-keyed, partial map-side); first/last counts
    * aggregate to O(days) rows, the join is day-keyed on those tiny
    * frames, and the cumulative window runs over O(days) — the
    * sparse-window discipline. */
  def userFlux(spark: SparkSession, dir: String): DataFrame = {
    val act = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000L").as("day"))
      .distinct()
      .checkpointSer // feeds the active count AND the span aggregate
    val active = act.groupBy("day").agg(count(lit(1)).as("n_active"))
    val span = act.groupBy("user_id")
      .agg(min("day").as("fd"), max("day").as("ld"))
    val firsts = span.groupBy(col("fd").as("day")).agg(count(lit(1)).as("n_new"))
    val lasts = span.groupBy(col("ld").as("day")).agg(count(lit(1)).as("n_last"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active
      .join(firsts, Seq("day"), "left")
      .join(lasts, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_last", coalesce(col("n_last"), lit(0L)))
      .withColumn("cum_users", sum("n_new").over(w))
      .select("day", "n_active", "n_new", "n_last", "cum_users")
      .orderBy("day")
  }

  /** Exact grouped quantiles (p25/p50/p75 of l_quantity per return
    * flag) via [[Ranking.groupedQuantiles]] — linear-interpolation
    * positions 0.25/0.5/0.75 are exact binary fractions over
    * integer-valued quantities, so the interpolated doubles reproduce
    * bit-for-bit in DuckDB's quantile_cont. The native GlobalRank path
    * range-partitions each flag's rows instead of buffering them on
    * one reducer: with 3 flags over the whole fact table, a grouped
    * `percentile` puts ~a third of the corpus in one ArrayBuffer. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Ranking.groupedQuantiles(
        Tables.lineitem(spark, dir)
          .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
        Seq("l_returnflag"), "l_quantity",
        Seq("l_orderkey", "l_linenumber"), Seq(0.25, 0.5, 0.75))
      .groupBy("l_returnflag")
      .agg(max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.5, col("q"))).as("p50"),
        max(when(col("p") === 0.75, col("q"))).as("p75"))
      .orderBy("l_returnflag")

  /** `events_transition_quantiles`: the TIMING companion to
    * `events_markov` (#98 says where users go next; THIS says how
    * fast): per (from_type, to_type) consecutive-event transition on
    * a user's timeline, the count and the exact p25/p50/p75 of the
    * gap in µs. A funnel whose click→purchase p75 stretches while p50
    * holds is losing its slow tail — the same tail-degradation read
    * as #277, applied to behavior.
    *
    * Shape: ONE user-keyed lead window builds the transition frame;
    * the quantiles ride [[Ranking.groupedQuantiles]] — the native
    * GlobalRank path, NO per-group percentile buffering — so the
    * panel holds even when one transition pair dominates the stream
    * (the hot (browse, browse) cell is exactly the case the buffering
    * aggregate dies on at scale). */
  def transitionQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val trans = Dedup.eventsUs(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type")
      .withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_ts", lead("ts_us", 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type").as("to_type"),
        (col("next_ts") - col("ts_us")).as("gap_us"), col("event_id"))
      .checkpointSer
    val counts = trans.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    Ranking.groupedQuantiles(trans, Seq("from_type", "to_type"), "gap_us",
        Seq("event_id"), Seq(0.25, 0.5, 0.75))
      .groupBy("from_type", "to_type")
      .agg(max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.5, col("q"))).as("p50"),
        max(when(col("p") === 0.75, col("q"))).as("p75"))
      .join(counts, Seq("from_type", "to_type"))
      .select("from_type", "to_type", "n_transitions", "p25", "p50", "p75")
      .orderBy("from_type", "to_type")
  }

  /** `events_active_days_histogram`: the engagement-DEPTH distribution
    * — users bucketed by how many distinct days they were active, per
    * bucket the user count, total user-days, and exact ratio4 user
    * share. The flux panel (#182) shows per-day arrivals/churn; THIS
    * shows how the user base splits between drive-by (1 day) and
    * habitual (20+) — the retention shape a DAU/WAU ratio (#113)
    * summarizes into one number. One distinct (user, day) frame, a
    * user-keyed count (both partial-aggregable), O(5) rollup. */
  def activeDaysHistogram(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.ratio4
    val perUser = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000L").as("day"))
      .distinct()
      .groupBy("user_id").agg(count(lit(1)).as("d"))
    val hist = perUser.select(
        when(col("d") === 1, 1L).when(col("d") <= 4, 2L)
          .when(col("d") <= 9, 3L).when(col("d") <= 19, 4L)
          .otherwise(5L).as("bucket_rank"),
        when(col("d") === 1, "1 day").when(col("d") <= 4, "2-4 days")
          .when(col("d") <= 9, "5-9 days").when(col("d") <= 19, "10-19 days")
          .otherwise("20+ days").as("bucket"),
        col("d"))
      .groupBy("bucket_rank", "bucket")
      .agg(count(lit(1)).as("n_users"), sum("d").as("n_user_days"))
    val tot = hist.agg(sum("n_users").as("t"))
    hist.crossJoin(broadcast(tot))
      .select(col("bucket_rank"), col("bucket"), col("n_users"),
        col("n_user_days"), ratio4(col("n_users"), col("t")).as("user_share4"))
      .orderBy("bucket_rank")
  }

  /** `orders_backlog_curve`: the open-work inventory over time — per
    * calendar day (exported as epoch days, the integer-export
    * discipline): line items entering the backlog (their order's
    * date), items leaving it (ship date), and the running backlog =
    * cum(ordered) − cum(shipped). The complement of
    * [[fulfillmentLag]]'s per-item latency: lag says how long ONE item
    * waits, THIS says how much work is in flight — the curve capacity
    * planning reads (a rising backlog with flat lag quantiles means
    * arrival outruns throughput before latency shows it).
    *
    * Shape: the order-key fact join once, then two O(days) daily
    * aggregates full-outer-joined on day and ONE cumulative window
    * over the O(days) frame (the sparse-window-over-aggregate
    * discipline — never raw lineitem through a single partition). */
  def backlogCurve(spark: SparkSession, dir: String): DataFrame = {
    def epochDay(c: Column) = datediff(c.cast("date"), lit("1970-01-01")).cast("long")
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    val withOrder = li.join(Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")), "l_orderkey")
    val ordered = withOrder
      .groupBy(epochDay(col("o_orderdate")).as("day_epoch"))
      .agg(count(lit(1)).as("n_ordered"))
    // shipped from the SAME joined frame: an orphaned line item (no
    // order row) must not leave a backlog it never entered
    val shipped = withOrder
      .groupBy(epochDay(col("l_shipdate")).as("day_epoch"))
      .agg(count(lit(1)).as("n_shipped"))
    val w = Window.orderBy("day_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered.join(shipped, Seq("day_epoch"), "full_outer")
      .withColumn("n_ordered", coalesce(col("n_ordered"), lit(0L)))
      .withColumn("n_shipped", coalesce(col("n_shipped"), lit(0L)))
      .withColumn("backlog",
        sum(col("n_ordered") - col("n_shipped")).over(w))
      .select("day_epoch", "n_ordered", "n_shipped", "backlog")
      .orderBy("day_epoch")
  }

  /** `orders_repeat_interval`: repeat-purchase cadence per market
    * segment — for every customer's consecutive order pair, the gap in
    * whole days; per segment: repeat customers, gap count, exact
    * ratio4 mean gap and the exact p25/p50/p75 via
    * [[Ranking.groupedQuantiles]] (5 segments over the whole order
    * stream is exactly the tiny-groups × huge-population shape the
    * buffering percentile dies on at scale). The commerce-retention
    * read: a stretching p75 with a flat p50 means the casual half of a
    * segment is lapsing before the loyal half shows it.
    *
    * Shape: one customer-keyed lag window builds the gap frame (orders
    * shuffles on o_custkey once), the segment joins in on the same key,
    * then one GlobalRank pass + O(segments) rollups. */
  def repeatInterval(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.ratio4
    val w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .cast("long").as("day"))
      .withColumn("prev", lag("day", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("day") - col("prev")).as("gap_days"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .checkpointSer
    val stats = gaps.groupBy("c_mktsegment")
      .agg(countDistinct("o_custkey").as("n_repeat_customers"),
        count(lit(1)).as("n_gaps"),
        ratio4(sum("gap_days"), count(lit(1))).as("mean_gap4"))
    Ranking.groupedQuantiles(gaps, Seq("c_mktsegment"), "gap_days",
        Seq("o_custkey", "o_orderkey"), Seq(0.25, 0.5, 0.75))
      .groupBy("c_mktsegment")
      .agg(max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.5, col("q"))).as("p50"),
        max(when(col("p") === 0.75, col("q"))).as("p75"))
      .join(stats, "c_mktsegment")
      .select("c_mktsegment", "n_repeat_customers", "n_gaps", "mean_gap4",
        "p25", "p50", "p75")
      .orderBy("c_mktsegment")
  }

  /** `orders_fulfillment_lag`: the operational latency panel — per
    * order month, item count, exact p25/p50/p75 of the ship lag in
    * whole days (l_shipdate − o_orderdate) and the worst straggler.
    * A drifting p75 with a flat p50 is the classic tail-degradation
    * signature; max_lag names the month to audit.
    *
    * Shape: ONE shuffle join on the uniform order key (THE fact-join
    * this schema is bucketed for — see Bucketing for the co-located
    * form), localCheckpointed once, then [[Ranking.groupedQuantiles]]
    * at binary-fraction positions over integer day lags (interpolated
    * doubles reproduce bit-for-bit in DuckDB quantile_cont — the
    * lineitem_quantiles discipline). The native GlobalRank path
    * range-partitions each month's lags across the cluster — a
    * O(10⁹)-row month never lands in one reducer buffer, closing the
    * trade the grouped `percentile` form documented. */
  def fulfillmentLag(spark: SparkSession, dir: String): DataFrame = {
    val lags = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("lag_days"),
        col("l_orderkey"), col("l_linenumber"))
      .checkpointSer
    val stats = lags.groupBy("year", "month")
      .agg(count(lit(1)).as("n_items"), max("lag_days").as("max_lag"))
    Ranking.groupedQuantiles(lags, Seq("year", "month"), "lag_days",
        Seq("l_orderkey", "l_linenumber"), Seq(0.25, 0.5, 0.75))
      .groupBy("year", "month")
      .agg(max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.5, col("q"))).as("p50"),
        max(when(col("p") === 0.75, col("q"))).as("p75"))
      .join(stats, Seq("year", "month"))
      .select("year", "month", "n_items", "p25", "p50", "p75", "max_lag")
      .orderBy("year", "month")
  }
}
