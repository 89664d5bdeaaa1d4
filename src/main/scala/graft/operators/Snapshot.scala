package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus snapshot comparison — the version-diff primitive an
  * incrementally re-crawled corpus needs before every re-train: which
  * documents were added, removed, edited, or untouched between two
  * snapshots, attributed per source.
  */
object Snapshot {

  /** #201 `corpus_snapshot_diff`: classify every doc_id across two
    * snapshot frames by (membership, content digest) into
    * added / removed / changed / unchanged, rolled up per source with
    * exact within-source shares. Content equality is digest equality
    * (md5 of the raw text — the same content-identity rule as
    * `dedup_exact_docs`), so "changed" means the bytes changed, not
    * the metadata.
    *
    * The registered query derives both snapshots deterministically
    * from the documents table (v1 drops doc_id ≡ 0 mod 3, v2 drops
    * doc_id ≡ 2 mod 5 and re-edits the text of doc_id ≡ 0 mod 7) —
    * the same simulated-replica pattern as the dedup DUP_CTE; the
    * [[snapshotDiffOf]] core takes ANY two (doc_id, source, text)
    * frames. Shape: one digest pass per side, a full-outer join
    * co-partitioned on doc_id (the only corpus-sized shuffle), then an
    * O(sources × 4) rollup. At 100 TB both sides hash-partition on
    * doc_id and the join never widens beyond the two digest columns. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val v1 = docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0L)
    val v2 = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 2L)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7L)) === 0L,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
    snapshotDiffOf(v1, v2)
  }

  /** [[snapshotDiff]] core over any two snapshot frames. */
  def snapshotDiffOf(v1: DataFrame, v2: DataFrame): DataFrame = {
    import graft.functions.Hashing.ratio4
    import graft.Partitioning.SpreadOps
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("doc_id"), col("source").as(s"source_$tag"),
        md5(col("text")).as(s"digest_$tag")).spread
    val joined = side(v1, "a").join(side(v2, "b"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source_a"), col("source_b")).as("source"),
        when(col("digest_a").isNull, "added")
          .when(col("digest_b").isNull, "removed")
          .when(col("digest_a") =!= col("digest_b"), "changed")
          .otherwise("unchanged").as("change_class"))
    val cells = joined.groupBy("source", "change_class")
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val perSource = cells.groupBy("source").agg(sum("n_docs").as("t"))
    cells.join(perSource, Seq("source"))
      .select(col("source"), col("change_class"), col("n_docs"),
        ratio4(col("n_docs"), col("t")).as("class_share"))
      .orderBy("source", "change_class")
  }
}
