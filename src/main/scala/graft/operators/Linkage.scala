package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Partitioning._
import graft.Tables

/** Fellegi–Sunter record-linkage calibration over the document corpus.
  *
  * Classic probabilistic linkage scores a candidate pair by summing
  * per-signal log-odds weights log(m/u), where m = P(signal agrees |
  * pair is a true match) and u = P(signal agrees | pair is a
  * non-match). This panel ESTIMATES those probabilities from the
  * corpus itself — m over the verified near-dup pair set (the engine's
  * ground-truth-by-construction match class), u over all remaining
  * pairs — giving the calibration table a blocking/scoring pipeline
  * (#226 `dedup_blocking_agreement` is the consumer) reads off.
  *
  * Scale posture: u NEVER enumerates non-match pairs — P(agree) over
  * all C(N,2) pairs is Σ_v C(n_v, 2) from the per-value marginal, an
  * O(distinct values) aggregate; the match side joins signals onto the
  * edge-sized verified pair list only. One corpus-grain stack+groupBy
  * per side; everything downstream is O(signals). Counts stay in
  * exact int64 (bounds: per-signal-value populations ≤ ~4·10⁶ docs
  * keep the ppm numerators under 2⁶³; beyond that the ppm scale drops
  * to per-mille — a documented knob, not a redesign).
  */
object Linkage {

  /** Length-band width (chars) for the `same_len_band` signal. */
  val LenBandChars = 100L

  /** Opening-prefix width for the `same_prefix` signal — the cheap
    * "same template opening" agreement a blocking pass keys on. */
  val PrefixChars = 24

  /** #262 `linkage_fs_weights`: per signal — agreement counts and
    * exact ppm rates over the match class (verified near-dup pairs at
    * the engine's τ) and the non-match class (everything else, by
    * marginal subtraction), plus the m/u odds ratio4 that IS the
    * Fellegi–Sunter weight (log-free: the rational stays
    * cross-engine-exact; consumers take logs at display time). */
  def fsWeights(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{halfUpDiv, intDiv, ratio4}
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "lang", "n_chars", "text")
      .spread
    val sig = docs.select(col("doc_id"), expr(
      s"""stack(4,
         |  'same_source', source,
         |  'same_lang', lang,
         |  'same_len_band', cast(n_chars div $LenBandChars as string),
         |  'same_prefix', lower(substring(trim(text), 1, $PrefixChars))
         |) as (signal, v)""".stripMargin))
      .localCheckpoint()
    // u side: P(agree) over ALL pairs from the per-value marginal —
    // Σ_v C(n_v, 2), no pair enumeration
    val allAgree = sig.groupBy("signal", "v").agg(count(lit(1)).as("c"))
      .groupBy("signal")
      .agg(sum(intDiv(col("c") * (col("c") - 1L), lit(2L))).as("all_agree"))
    val n = docs.count()
    val allPairs = n * (n - 1L) / 2L
    // m side: agreement over the edge-sized verified match list
    val pairs = MinHashLSH.nearDupPairs(spark, dir).select("d1", "d2")
    val matchAgg = pairs
      .join(sig.as("a"), col("d1") === col("a.doc_id"))
      .join(sig.as("b"),
        col("d2") === col("b.doc_id") && col("a.signal") === col("b.signal"))
      .groupBy(col("a.signal").as("signal"))
      .agg(count(lit(1)).as("match_pairs"),
        sum(when(col("a.v") === col("b.v"), 1L).otherwise(0L)).as("match_agree"))
    matchAgg.join(allAgree, "signal")
      .select(col("signal"), col("match_pairs"), col("match_agree"),
        halfUpDiv(col("match_agree") * 1000000L,
          greatest(col("match_pairs"), lit(1L))).as("m_ppm"),
        lit(allPairs).minus(col("match_pairs")).as("nonmatch_pairs"),
        (col("all_agree") - col("match_agree")).as("nonmatch_agree"),
        halfUpDiv((col("all_agree") - col("match_agree")) * 1000000L,
          greatest(lit(allPairs) - col("match_pairs"), lit(1L))).as("u_ppm"))
      .withColumn("weight4", ratio4(col("m_ppm"),
        greatest(col("u_ppm"), lit(1L))))
      .orderBy("signal")
  }
}
