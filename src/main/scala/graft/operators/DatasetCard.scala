package graft.operators

import graft.Partitioning._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dataset card — the one-stop summary panel a training-data
  * release ships next to the corpus (datasheet/dataset-card practice):
  * size, composition, duplication, language mix and quality posture as
  * a fixed set of exact metrics, every one reusing THE defining
  * primitive of its family (the md5 content digest of `dedup_exact
  * _docs`' normalization-free grain, the `predLangCol` language vote,
  * the int64 `qualityKeyFromText`) so the card can never drift from
  * the panels it summarizes.
  */
object DatasetCard {

  /** Short-document threshold (tokens) — the min-length gate the
    * survival curve (#169) sweeps; the card reports its cost at 32. */
  val ShortDocToks = 32L

  /** #224 `corpus_dataset_card`: (metric, n, r4) rows — counts carry
    * `n` (BIGINT, NULL otherwise), shares/means carry `r4` (HALF_UP
    * 1e-4 exact rationals, NULL otherwise).
    *
    * Shape: ONE corpus scan computes every per-doc signal (token
    * count, digest, language vote, quality key) and feeds a single
    * multi-distinct aggregate (Spark plans the distinct set via one
    * Expand — the `profile_events` pattern); the top-source share is
    * the only second aggregate, O(sources), crossJoined back as a
    * 1-row broadcast. The card unpivots via `stack` over the 1-row
    * frame — O(metrics) rows out. */
  def card(spark: SparkSession, dir: String): DataFrame =
    cardOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).spread)

  /** [[card]] core over any (doc_id, source, text) frame — a frame
    * without `source` gets the single pseudo-source "all" (the
    * DocPipeline terminal's shape). */
  def cardOf(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing.{halfUpDiv, ratio4}
    val withSource =
      if (docs.columns.contains("source")) docs
      else docs.withColumn("source", lit("all"))
    val base = withSource
      .select(col("source"),
        // greatest(…, 0): NULL text → NULL token array → negative/NULL
        // size; it must count as an empty doc. The language vote handles
        // NULL toks itself (predLangCol pins NULL ≡ empty ≡ 'und').
        greatest(size(TextAnalysis.tokens(col("text"))).cast("long"), lit(0L))
          .as("n_toks"),
        md5(col("text")).as("digest"),
        TextAnalysis.predLangCol(TextAnalysis.tokens(col("text"))).as("lang"),
        // the quality key divides by the token count — token-less docs
        // carry a NULL key (sum skips them) instead of an ANSI
        // divide-by-zero
        when(size(TextAnalysis.tokens(col("text"))) > 0,
          TextAnalysis.qualityKeyFromText(col("text"))).as("qkey"))
    val agg = base.agg(
      count(lit(1)).as("n_docs"),
      sum("n_toks").as("n_tokens"),
      countDistinct("source").as("n_sources"),
      countDistinct("lang").as("n_langs"),
      countDistinct("digest").as("n_unique"),
      sum(when(col("n_toks") < ShortDocToks, 1L).otherwise(0L)).as("n_short"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      sum("qkey").as("sum_qkey"))
    val topSource = base.groupBy("source").agg(count(lit(1)).as("c"))
      .agg(max("c").as("top_source_docs"))
    agg.crossJoin(broadcast(topSource))
      .select(
        col("n_docs"), col("n_tokens"), col("n_sources"), col("n_langs"),
        col("n_unique"), col("top_source_docs"),
        ratio4(col("n_docs") - col("n_unique"), col("n_docs")).as("dup_share4"),
        ratio4(col("n_tokens"), col("n_docs")).as("mean_tokens4"),
        ratio4(col("n_short"), col("n_docs")).as("short_share4"),
        ratio4(col("n_en"), col("n_docs")).as("en_share4"),
        (halfUpDiv(col("sum_qkey"), col("n_docs")) / lit(10000.0)).as("mean_quality4"),
        ratio4(col("top_source_docs"), col("n_docs")).as("top_source_share4"))
      .select(expr(
        """stack(12,
          |  'n_docs', n_docs, CAST(NULL AS DOUBLE),
          |  'n_tokens', n_tokens, CAST(NULL AS DOUBLE),
          |  'n_sources', n_sources, CAST(NULL AS DOUBLE),
          |  'n_langs_pred', n_langs, CAST(NULL AS DOUBLE),
          |  'n_unique_texts', n_unique, CAST(NULL AS DOUBLE),
          |  'top_source_docs', top_source_docs, CAST(NULL AS DOUBLE),
          |  'dup_share4', CAST(NULL AS BIGINT), dup_share4,
          |  'mean_tokens4', CAST(NULL AS BIGINT), mean_tokens4,
          |  'short_share4', CAST(NULL AS BIGINT), short_share4,
          |  'en_share4', CAST(NULL AS BIGINT), en_share4,
          |  'mean_quality4', CAST(NULL AS BIGINT), mean_quality4,
          |  'top_source_share4', CAST(NULL AS BIGINT), top_source_share4
          |) as (metric, n, r4)""".stripMargin))
      .orderBy("metric")
  }
}
