package graft.operators

import graft.Partitioning._
import graft.Tables
import graft.functions.Hashing.ratio4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition reports: the term/shingle/cluster distribution
  * panels a curation dashboard shows next to the per-document signals
  * (QualitySignals) and the near-dup audits (Curation). Everything here
  * aggregates to tiny outputs, so the scale cost is the scan + one or
  * two partial-aggregable shuffles.
  */
object CorpusStats {

  /** Zipf head: the `topN` corpus terms by total term frequency, with
    * document frequency and a dense 1-based rank (tf desc, term asc —
    * total order, so the rank is deterministic). Aggregation is
    * (doc, term) → (term): both layers partial-aggregate map-side, and
    * the per-doc pre-count bounds the second shuffle's key volume by
    * distinct (doc, term), never raw token volume. The rank window runs
    * on the already-LIMITed head, not the corpus. */
  def zipfTerms(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    val head = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t")).spread
      .select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("term").agg(sum("c").as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(topN)
    head
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tf").desc, col("term")))
          .cast("long"))
      .select("rank", "term", "tf", "df")
      .orderBy("rank")
  }

  /** Shingle document-frequency profile: how many distinct 3-shingles
    * occur in exactly `df` documents. The long tail at df=1 is original
    * content; mass at high df is boilerplate — this is the histogram
    * that justifies the near-dup hot-shingle cap (DocDedup.MaxShingleDf)
    * on a given corpus. Two partial-aggregable shuffles (shingle → df),
    * output is ~tens of rows. */
  def shingleDfProfile(spark: SparkSession, dir: String): DataFrame =
    DocDedup.docShingles(spark, dir)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_shingles"))
      .orderBy("df")

  /** #165 `corpus_heaps_curve`: vocabulary growth over the corpus in
    * doc_id order (Heaps' law) — per tenth of the id range: token
    * volume, NEW term types first seen there, and the running
    * cumulative of both. The curve's flattening rate is what justifies
    * (or refutes) a vocabulary cap at a given corpus scale. One token
    * scan feeds both aggregates (bucket token counts; term → first
    * doc_id → bucket), each partial map-side; the cumulative window
    * runs over the O(10) bucket rows, never the corpus. Bucket =
    * (doc_id·10) div (max_id+1) — exact integer arithmetic, so the
    * cut points reproduce in any engine. */
  def heapsCurve(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t")).spread
      .select(col("doc_id"), explode(col("t")).as("term"))
    val mx = Tables.documents(spark, dir).agg(max("doc_id").as("m"))
    def bucketOf(id: org.apache.spark.sql.Column) =
      graft.functions.Hashing.intDiv(id * 10L, col("m") + 1L)
    val byBucket = tk.crossJoin(broadcast(mx))
      .groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(count(lit(1)).as("toks"))
    val newTypes = tk.groupBy("term").agg(min("doc_id").as("fd"))
      .crossJoin(broadcast(mx))
      .groupBy(bucketOf(col("fd")).as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket.join(newTypes, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .select(col("bucket"), col("toks"),
        sum("toks").over(w).as("cum_toks"),
        col("new_types"),
        sum("new_types").over(w).as("cum_types"))
      .orderBy("bucket")
  }

  /** Per-document coverage by the corpus's `topN` bigrams: the share of
    * a document's bigram occurrences that are corpus-head bigrams.
    * High coverage = the document is assembled from the corpus's most
    * common phrasing (template/boilerplate smell); low = rare phrasing.
    *
    * Two passes over the derived bigram frame — one to elect the head
    * (count + LIMIT, a tiny result), one to score documents against it
    * via a BROADCAST left join (the head is topN rows by construction,
    * so the scoring pass adds no shuffle beyond its own per-doc
    * aggregation). Deliberately NOT materialized in between: at corpus
    * scale the bigram frame is larger than the input, so two scans beat
    * one persist. */
  def bigramCoverage(spark: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    def bigrams: DataFrame = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t")).spread
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2), i =>
          concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .as("pair"))
    val head = bigrams.groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(topN)
      .select(col("pair"), lit(1L).as("hit"))
    bigrams.join(broadcast(head), Seq("pair"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum("hit"), lit(0L)).as("covered"))
      .select(col("doc_id"), col("n_bigrams"), col("covered"),
        ratio4(col("covered"), col("n_bigrams")).as("coverage"))
      .orderBy("doc_id")
  }

  /** Near-dup cluster size histogram: for each component size, the
    * number of transitive near-dup clusters of that size and the total
    * documents they hold — the one-page answer to "how duplicated is
    * this corpus, and is it pairs or giant template families?". Rides
    * [[MinHashLSH.nearDupComponents]]; the histogram itself is two
    * aggregations over the (tiny) component labeling. */
  def clusterSizes(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame =
    MinHashLSH.nearDupComponents(spark, dir, tau)
      .groupBy("component_id").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"))
      .orderBy("sz")
}
