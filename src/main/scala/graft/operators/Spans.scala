package graft.operators

import graft.Partitioning._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicated-SPAN analysis: how much of each document's token stream
  * is covered by passages that also occur in other documents — the
  * per-document diagnostic behind exact-substring dedup (train-data
  * dedup removes or down-weights such spans; this panel measures how
  * much there is and where). Distinct from `corpus_dup_ngram_share`
  * (corpus-level shingle mass) and `dedup_passages` (passage-grain
  * candidates): here overlapping duplicated n-grams are MERGED into
  * maximal intervals per document, so a doc quoting one long passage
  * counts its true covered length, not an n-gram-inflated multiple.
  */
object Spans {

  /** Span grain: token 3-grams (the corpus-wide shingle grain). */
  val SpanN = 3

  /** #216 `docs_dup_span_coverage`: per-source histogram of per-doc
    * duplicated-token coverage.
    *
    * Every positioned 3-gram occurring in ≥2 distinct documents marks
    * its token interval [p, p+2] duplicated; a document's covered
    * token count is the length of the UNION of its marked intervals —
    * the classic islands merge, computed with one per-doc window (an
    * interval starts an island when its start exceeds the running max
    * end of all earlier intervals). Coverage bands are exact integer
    * deciles (band = ⌊10·covered/n_tokens⌋, 10 = fully duplicated).
    *
    * Shape: positions explode to corpus token volume once; cross-doc
    * duplication is a min≠max window over the shingle hash (linear —
    * no pair join, so no hot-shingle quadratic hazard and no df cap
    * needed); the islands merge shuffles once on doc_id. At 100 TB:
    * two hash exchanges of narrow (id, int) rows, each on uniform
    * keys. Zero-coverage docs (no duplicated span, or fewer than 3
    * tokens) stay in the panel via the left join — band 0 counts them. */
  def dupSpanCoverage(spark: SparkSession, dir: String): DataFrame =
    dupSpanCoverageOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).spread)

  /** [[dupSpanCoverage]] core over any (doc_id, source, text) frame. */
  def dupSpanCoverageOf(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    // greatest(…, 0): a NULL text tokenizes to a NULL array whose size
    // is −1 — it must count as an empty doc, not subtract from totals
    val meta = docs.select(col("doc_id"), col("source"),
      greatest(size(TextAnalysis.tokens(col("text"))).cast("long"), lit(0L))
        .as("n_toks"))
    // positioned (NOT distinct) shingles via the fused rolling-window
    // kernel — plans.WindowHashArray computes EXACTLY h64 of the
    // space-joined trigram with pos from 1 (the former transform-lambda
    // spelling evaluated md5→Conv interpreted per position); the
    // shingle rides as its 60-bit hash — equality is all downstream
    // needs, and 8 bytes beat re-shuffling the raw trigram text
    val pos = docs.fanOut // pre-explosion fan-out: see Partitioning.fanOut
      .select(col("doc_id"), explode(
        graft.plans.TextExpressions.windowHashes(col("text"), SpanN)).as("ps"))
      .select(col("doc_id"), col("ps.pos").as("p"), col("ps.h").as("sh"))
      .checkpointSer // hash rollup + probe read one derivation
    // cross-doc duplication as a partial-aggregable min≠max ROLLUP +
    // join-back instead of a min/max window over the positioned stream:
    // the window spelling sorted all 46.6M rows by sh at sf10 (the
    // dominant cost of this panel's 160 s); the rollup hash-aggregates
    // with map-side combine, and only the cross-doc hash list (a small
    // fraction of hashes) reaches the probe join — AQE sees its true
    // size at runtime. Identical rows: min(doc)≠max(doc) per sh ⇔ the
    // hash occurs in ≥2 distinct documents.
    val cross = pos.groupBy("sh")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("sh")
    val dup = pos.join(cross, "sh")
      .select(col("doc_id"), col("p"), (col("p") + (SpanN - 1)).as("e"))
      // a position can mark only one interval, but equal (doc, p) rows
      // cannot arise anyway: p is unique within a doc
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    val prev = wDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val covered = dup
      .withColumn("prev_max_e", max("e").over(prev))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("p") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island", sum("new_island").over(
        wDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg((max("e") - min("p") + 1L).as("len"))
      .groupBy("doc_id")
      .agg(sum("len").as("covered"))
    meta.join(covered, Seq("doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .withColumn("band",
        intDiv(col("covered") * 10L, greatest(col("n_toks"), lit(1L))))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("tot_tokens"),
        sum("covered").as("dup_tokens"))
      .withColumn("share4",
        ratio4(col("dup_tokens"), greatest(col("tot_tokens"), lit(1L))))
      .orderBy("source", "band")
  }
}
