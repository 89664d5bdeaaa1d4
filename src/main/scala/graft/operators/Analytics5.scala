package graft.operators

import graft.Partitioning._
import graft.Tables
import graft.functions.Hashing.ratio4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth analytics tier: temporal composition (seasonality), cohort
  * revenue, and sentence-level text readability. Integer-exact grains
  * and ratio4 ratios throughout.
  */
object Analytics5 {

  /** Activity seasonality matrix: event count per (hour-of-day ×
    * day-of-week) cell plus each cell's ratio4 share of its day's
    * total. Grains are pure epoch integer arithmetic (hod = hour mod
    * 24, dow = day mod 7 — epoch-relative, deliberately calendar-free
    * so the bucketing is engine- and timezone-independent). One
    * partial-aggregable shuffle on 168 keys; the day-total is a window
    * over the aggregate. */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val wD = Window.partitionBy("dow")
    Dedup.eventsUs(spark, dir)
      .select(expr("(ts_us div 3600000000L) % 24").as("hod"),
        expr("(ts_us div 86400000000L) % 7").as("dow"))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("n"))
      .withColumn("day_share", ratio4(col("n"), sum("n").over(wD)))
      .orderBy("dow", "hod")
  }

  /** Cohort revenue matrix: users grouped by first-active day; for
    * each day offset, that cohort's exact cents revenue and spender
    * count — the monetary twin of the retention matrix, sharing its
    * shape: the cohort day is a WINDOW over the per-(user, day)
    * aggregate (no joined-back cohort branch re-scanning events), so
    * the pipeline is one events scan + one user_id exchange + the
    * (cohort, offset) rollup. */
  def cohortRevenue(spark: SparkSession, dir: String, maxOffset: Int = 7): DataFrame = {
    import graft.functions.Hashing.valueCents
    val perUserDay = Dedup.eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us div ${Analytics3.DayUs}L").as("day"),
        valueCents(col("value")).as("cents"))
      .groupBy("user_id", "day")
      .agg(sum("cents").as("cents"))
    Analytics3.cohortOffsets(perUserDay, maxOffset)
      .groupBy("cohort_day", "offset")
      // n_active = active (user, day) cells — includes zero-cent days;
      // "spenders" would need a cents > 0 gate
      .agg(count(lit(1)).as("n_active"), sum("cents").as("sum_cents"))
      .orderBy("cohort_day", "offset")
  }

  /** Quality-score histogram: documents per exact-integer quality-key
    * bucket (the key is TextAnalysis.qualityKeyCol's 1e-4-unit int64;
    * bucket width 500 = 0.05 score units). THE panel for choosing a
    * gate threshold: integer bucketing over the exact key means the
    * histogram — and any threshold read off it — reproduces anywhere.
    * One narrow scan + one 21-key shuffle. */
  def qualityHistogram(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.intDiv
    Tables.documents(spark, dir)
      .select(intDiv(TextAnalysis.qualityKeyFromText(col("text")), lit(500L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")
  }

  /** `docs_length_quality_grid`: the JOINT (length decile × quality
    * decile) distribution — the bias audit for any length-based gate:
    * #169 (length survival) and #143 (quality histogram) each see one
    * marginal, but whether "drop short docs" ALSO drops the quality
    * tail only shows in the joint grid (mass on the diagonal = the
    * two signals are near-redundant; a flat grid = length carries no
    * quality information and a length gate is quality-neutral). Per
    * occupied (ldec, qdec) cell: doc count and the exact ratio4 share
    * within the length decile (rows of the grid each sum to 1).
    *
    * Deciles are the exact int64 rank formula ((rn−1)·10 div N + 1,
    * ties broken by doc_id) over TWO native GlobalRank passes — each
    * one range exchange, never a single-partition window — joined on
    * the uniform int doc key; the grid rollup is O(100) rows. */
  def lengthQualityGrid(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.qualityKeyFromText(col("text")).as("qkey"))
      .checkpointSer
    val n = base.count()
    def decile(rn: org.apache.spark.sql.Column) =
      intDiv((rn - 1L) * 10L, lit(n)) + 1L
    val ld = Ranking.globalRowNumber(base.select("doc_id", "n_chars"),
        Seq(col("n_chars"), col("doc_id")), "lrn")
      .select(col("doc_id"), decile(col("lrn")).as("ldec"))
    val qd = Ranking.globalRowNumber(base.select("doc_id", "qkey"),
        Seq(col("qkey"), col("doc_id")), "qrn")
      .select(col("doc_id"), decile(col("qrn")).as("qdec"))
    val grid = ld.join(qd, "doc_id")
      .groupBy("ldec", "qdec").agg(count(lit(1)).as("n_docs"))
    val rowTot = grid.groupBy("ldec").agg(sum("n_docs").as("row_total"))
    grid.join(rowTot, "ldec")
      .select(col("ldec"), col("qdec"), col("n_docs"),
        ratio4(col("n_docs"), col("row_total")).as("row_share4"))
      .orderBy("ldec", "qdec")
  }

  /** `dedup_survivorship_quality`: does near-dup dedup BIAS the
    * corpus? Per exact quality decile: doc count, docs a
    * min-keeper near-dup dedup would drop (non-keeper members of the
    * LSH components — the #42 grain, dropped = doc_id ≠ component_id
    * since min-label components label by the min doc), and the ratio4
    * drop share. A flat drop_share4 row means dedup is
    * quality-neutral; drops concentrated in the top deciles mean the
    * near-dup gate is silently eating the best documents (templated
    * high-quality families) and the keeper rule should switch to
    * best-quality (#104).
    *
    * Shape: ONE GlobalRank pass for the deciles + the memoized
    * verified-pair components (shared with the ~10 other consumers —
    * no new corpus pass in a warm session); the join is uniform
    * int doc keys, the rollup O(10) rows. */
  def dedupSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityKeyFromText(col("text")).as("qkey"))
      .checkpointSer
    val n = base.count()
    val qd = Ranking.globalRowNumber(base, Seq(col("qkey"), col("doc_id")), "qrn")
      .select(col("doc_id"),
        (intDiv((col("qrn") - 1L) * 10L, lit(n)) + 1L).as("qdec"))
    val dropped = MinHashLSH.nearDupComponents(spark, dir)
      .filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id"), lit(true).as("is_dropped"))
    qd.join(dropped, Seq("doc_id"), "left")
      .groupBy("qdec")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("qdec"), col("n_docs"), col("n_dropped"),
        ratio4(col("n_dropped"), col("n_docs")).as("drop_share4"))
      .orderBy("qdec")
  }

  /** Calendar-grain revenue trend: per (year, month) of l_shipdate,
    * decimal-exact discounted revenue and row count, with the previous
    * OBSERVED month's revenue delta in exact cents. The only
    * calendar-extraction time series in the suite (event panels are
    * deliberately epoch-relative); year/month parity is already proven
    * by the TPC-H q7/q8 oracles. The lag window runs over the
    * O(months) aggregate — a single ordered partition of report rows,
    * never raw lineitem. The first month's delta is measured against a
    * zero baseline (= its full revenue) — the same empty-start
    * contract as hourlyChange's prev_n; consumers that want "no prior
    * period" as absent should filter the first row, not treat the
    * spike as movement. */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{dec, money2}
    val w = Window.orderBy("year", "month")
    Tables.lineitem(spark, dir)
      .select(year(col("l_shipdate")).as("year"), month(col("l_shipdate")).as("month"),
        (dec(col("l_extendedprice")) * (dec(lit(1.0)) - dec(col("l_discount")))).as("rev"))
      .groupBy("year", "month")
      .agg(count(lit(1)).as("n_items"), sum("rev").as("rev_exact"))
      .withColumn("revenue", money2(col("rev_exact")))
      .withColumn("delta_cents",
        round(col("rev_exact") * 100, 0).cast("long") -
          coalesce(round(lag("rev_exact", 1).over(w) * 100, 0).cast("long"), lit(0L)))
      .select("year", "month", "n_items", "revenue", "delta_cents")
      .orderBy("year", "month")
  }

  /** Sentence-level readability profile per document: sentence count
    * (terminator runs — consecutive [.!?] collapse to one boundary),
    * word count, and ratio4 words-per-sentence — the cheap C4-style
    * "is this prose?" signal. Pure per-row regex counting, no
    * shuffle; documents with no terminator count as one sentence.
    *
    * Terminator-RUN count below: (length with each [.!?]+ run as one
    * char) minus (length with runs removed) = number of runs.
    * Column-level so the spec can probe it on a controlled fixture. */
  def sentenceRuns(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (length(regexp_replace(text, "[.!?]+", "x")) -
      length(regexp_replace(text, "[.!?]+", ""))).cast("long")

  def readability(spark: SparkSession, dir: String): DataFrame = {
    val runs = sentenceRuns(col("text"))
    val words = size(TextAnalysis.tokens(col("text"))).cast("long")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      words.as("n_words"),
      greatest(runs, lit(1L)).as("n_sentences"),
      ratio4(words, greatest(runs, lit(1L))).as("words_per_sentence")
    ).orderBy("doc_id")
  }
}
