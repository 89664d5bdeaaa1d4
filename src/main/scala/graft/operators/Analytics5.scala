package graft.operators

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

  /** Sentence-level readability profile per document: sentence count
    * (terminator runs — consecutive [.!?] collapse to one boundary),
    * word count, and ratio4 words-per-sentence — the cheap C4-style
    * "is this prose?" signal. Pure per-row regex counting, no
    * shuffle; documents with no terminator count as one sentence. */
  /** Terminator-RUN count: (length with each [.!?]+ run as one char)
    * minus (length with runs removed) = number of runs. Column-level so
    * the spec can probe it on a controlled fixture. */
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
