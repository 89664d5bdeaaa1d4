package graft.api

import graft.functions.Hashing.h64
import graft.operators.{DocDedup, MinHashLSH, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fluent composition of the document-cleaning operators over any
  * (doc_id, text) frame:
  *
  * {{{
  * DocPipeline(docs)
  *   .exactDedup()
  *   .nearDupRemove(tau = 0.5)
  *   .qualityFilter(min = 0.6)
  *   .languageFilter("en")
  *   .fingerprint()
  *   .df
  * }}}
  *
  * Every combinator APPENDS transforms to one declarative plan —
  * nothing materializes between stages, so Catalyst still shares
  * scans, pushes filters, and broadcasts the small side of every gate.
  * Semantics are SEQUENTIAL: each stage sees its predecessor's
  * survivors (so scrub() affects downstream dedup, and a dedup stage's
  * hot-bucket caps apply to the already-filtered corpus) — which can
  * legitimately differ from Pipeline.cleanDocs' one-shot full-corpus
  * gating when removed rows straddle a cap boundary; the parity spec
  * compares the two on corpora where they coincide. Per-stage
  * expressions and caps are the oracle-checked operators' own.
  */
final class DocPipeline private (val df: DataFrame) {

  private def next(d: DataFrame) = new DocPipeline(d)

  /** Keep the minimum doc_id of every normalized-text duplicate group
    * (dedup_exact_docs semantics). Derived from the CURRENT frame, so
    * an earlier scrub() participates in the dedup decision. */
  def exactDedup(): DocPipeline = {
    val keepers = df.select("doc_id", "text")
      .withColumn("digest", h64(DocDedup.normalized(col("text"))))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    next(df.join(keepers, "doc_id"))
  }

  /** Drop the larger side of every verified MinHash near-dup pair
    * (dedup_minhash_lsh semantics, hot-bucket cap included). Derived
    * from the CURRENT frame, like exactDedup. */
  def nearDupRemove(tau: Double = 0.5): DocPipeline = {
    val losers = MinHashLSH.nearDupPairsOf(df.select("doc_id", "text"), tau)
      .select(col("d2").as("doc_id")).distinct()
    next(df.join(losers, Seq("doc_id"), "left_anti"))
  }

  private def withToks(d: DataFrame): DataFrame =
    if (d.columns.contains("toks")) d
    else d.withColumn("toks", TextAnalysis.tokens(col("text")))

  /** Gate on the composite quality score (text_quality semantics);
    * exposes `n_toks` and `quality_score`. */
  def qualityFilter(min: Double): DocPipeline = {
    val d = withToks(df)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("quality_score", TextAnalysis.qualityScoreCol(col("toks"),
        length(regexp_replace(col("text"),
          s"[${TextAnalysis.WsClass}]", "")).cast("long")))
    next(d.filter(col("quality_score") >= min))
  }

  /** Gate on the predicted language (text_language_id semantics). */
  def languageFilter(lang: String): DocPipeline = {
    val d = withToks(df).withColumn("pred_lang", TextAnalysis.predLangCol(col("toks")))
    next(d.filter(col("pred_lang") === lang))
  }

  /** Redact PII/URLs in the text itself (text_scrub semantics) —
    * typically the FIRST stage, before anything tokenizes. */
  def scrub(): DocPipeline =
    next(df.withColumn("text", TextAnalysis.scrubbedText(col("text"))))

  /** Attach the rolling-hash fingerprint (text_fingerprint semantics). */
  def fingerprint(): DocPipeline =
    next(df.withColumn("fingerprint", TextAnalysis.fingerprintCol(col("text"))))

  /** The canonical cleaned-corpus projection (pipeline_clean_docs
    * column contract). */
  def cleaned: DataFrame =
    df.select("doc_id", "n_toks", "quality_score", "fingerprint")
      .orderBy("doc_id")

  /** Terminal: sequence-pack the SURVIVING corpus
    * (pipeline_pack_sequences semantics over this pipeline's frame) —
    * doc_id-ordered concatenate-and-cut with global offsets from the
    * range-repartitioned prefix sum. */
  def packed(seqLen: Long = graft.operators.Pipeline.PackSeqLen): DataFrame =
    graft.operators.Pipeline.packOf(
      withToks(df).select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks")),
      seqLen)

  /** Terminal: data-mixture report of the SURVIVING corpus
    * (source_mix_report semantics) — requires a `source` column. */
  def mixReport: DataFrame =
    graft.operators.Curation.sourceMixReportOf(df.select("source", "text"))

  /** Keep docs a TRAINED curated-vs-crawl lexicon scores curated-like
    * (quality_lexicon_score pred=1 semantics). The lexicon comes from
    * [[graft.operators.QualityModels.lexiconTrain]] — train once on
    * the reference corpus, gate any number of pipelines with the same
    * frozen model (out-of-vocabulary terms fall back to the prior). */
  def lexiconGate(lex: DataFrame): DocPipeline = {
    val keep = graft.operators.QualityModels
      .lexiconScoreOf(df.select("doc_id", "text"), lex)
      .filter(col("pred") === 1).select("doc_id")
    next(df.join(keep, "doc_id"))
  }

  /** Attach the DSIR `importance` column from a TRAINED bucket table
    * ([[graft.operators.QualityModels.dsirBucketTable]]) — broadcast
    * map-side scoring; ≤1-token docs score no bigrams and drop (they
    * are not trainable sequences). */
  def importanceWeight(buckets: DataFrame): DocPipeline =
    next(df.join(
      graft.operators.QualityModels.dsirScoreOf(df.select("doc_id", "text"), buckets)
        .select("doc_id", "importance"),
      "doc_id"))

  /** Terminal: token-balanced serpentine shard assignment of the
    * SURVIVING corpus (pipeline_shard_plan semantics) — the frame a
    * writer feeds to `partitionBy("shard")` so no output shard
    * straggles downstream reads. */
  def sharded(nShards: Int = graft.operators.Pipeline.NumShards): DataFrame =
    graft.operators.Pipeline.shardAssignmentsOf(
      df.select("doc_id", "text"), nShards)

  /** Terminal: the dataset card of the SURVIVING corpus
    * (corpus_dataset_card semantics) — the release datasheet a
    * pipeline run ships next to its output; frames without a `source`
    * column report one pseudo-source. */
  def datasetCard: DataFrame =
    graft.operators.DatasetCard.cardOf(df)
}

object DocPipeline {
  /** Start a pipeline over a (doc_id, text) frame. */
  def apply(docs: DataFrame): DocPipeline = new DocPipeline(docs)
}
