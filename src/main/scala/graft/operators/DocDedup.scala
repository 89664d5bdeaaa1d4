package graft.operators

import graft.Tables
import graft.functions.Hashing.h64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-level deduplication for an LLM-data pipeline: exact
  * (normalize→hash→groupBy) and n-gram-Jaccard near-dup (shingle
  * explode → shuffle on shingle → pair aggregation). No cross joins:
  * candidate generation is linear in (docs × shingles), pairs only
  * materialize for docs that actually share a shingle.
  */
object DocDedup {

  /** Canonical text: lowercase, trim, collapse whitespace. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Distinct 3-token shingles of a document. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1),
          element_at(toks, i + 2),
          element_at(toks, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** documents ∪ an upper-cased replica (id+100000) — deterministic
    * casing noise that exact normalization must collapse. */
  def docsWithCaseNoise(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    d.unionAll(d.select((col("doc_id") + 100000L).as("doc_id"),
                        upper(col("text")).as("text")))
  }

  /** #7: exact dedup on normalized text — one shuffle on the digest. */
  def exactDocs(spark: SparkSession, dir: String): DataFrame =
    docsWithCaseNoise(spark, dir)
      .withColumn("digest", h64(normalized(col("text"))))
      .groupBy("digest")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "digest", "n_copies")
      .orderBy("keep_id")

  /** Deterministic k-per-group sample: rank by a seeded hash of the row
    * key — reproducible "random" sampling (same inputs → same sample on
    * any cluster size), the property a curation pipeline needs for
    * auditable training sets. One shuffle on the group key. */
  def samplePerSource(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("rand_key"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("rand_key",
        graft.functions.Hashing.h64(concat(lit("sample:"), col("doc_id").cast("string"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("source", "rnk", "doc_id")
      .orderBy("source", "rnk")
  }

  /** (doc_id, shingle) pairs, shingles distinct per doc.
    *
    * The scan is spread across all cores first: the test tables are
    * single-row-group parquet files (one scan split), and the shingle
    * expression is the per-row hot spot — without the repartition the
    * whole fan-out runs on one core. On a real multi-file/multi-row-
    * group table the scan parallelizes itself and the repartition is a
    * cheap no-op-sized shuffle of the narrow (doc_id, text) projection. */
  def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        // fused native expression — same output as
        // explode(shingles3(tokens(text))), ~5× faster per row
        explode(graft.plans.TextExpressions.shingles(col("text"), 3)).as("shingle"))

  /** #8: near-dup pairs by true n-gram Jaccard ≥ τ. Shuffles: one on
    * shingle (candidate generation), one on the pair key (intersection
    * count). Per-doc shingle counts are broadcast back onto the pairs.
    * At 100 TB a boilerplate-shingle hot key would fan out quadratically
    * — the MinHash/LSH operator (MinHashLSH.scala) is the scale path;
    * this one is the exact verifier. */
  def ngramJaccard(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val sh = docShingles(spark, dir)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val pairs = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(counts.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1")), "d1")
      .join(broadcast(counts.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2")), "d2")
      .withColumn("jaccard", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jaccard") >= tau)
      .select("d1", "d2", "shared", "jaccard")
      .orderBy("d1", "d2")
  }
}
