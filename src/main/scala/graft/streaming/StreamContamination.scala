package graft.streaming

import graft.functions.Hashing.h64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online decontamination gate: documents arriving on a stream are
  * checked against a STATIC benchmark shingle table — the
  * stream-static join form of the batch contamination report, and the
  * shape an ingest pipeline actually deploys (the benchmark set is
  * fixed; the corpus streams).
  *
  * The static side is the distinct eval-split shingle hashes (bounded
  * by the benchmark suite size → broadcast); each micro-batch explodes
  * only its own documents. Per-doc totals and hits come out of one
  * streaming aggregation, exactly like the batch plan. */
object StreamContamination {

  /** Per-document shingle totals and eval overlaps over a streaming (or
    * batch) (doc_id, text) frame. Run in complete/update mode; filter
    * n_contaminated > 0 downstream for the contaminated-only report.
    * Both sides shingle through Curation.shingleHashesOf — pass the
    * SAME `n` here and to `evalShingles`, or the join probes a table
    * of differently-sized n-grams and silently reports a clean corpus. */
  def contaminationFlags(docs: DataFrame, evalShingles: DataFrame,
                         n: Int = graft.operators.Curation.ContamN): DataFrame =
    graft.operators.Curation.shingleHashesOf(docs, n)
      .join(broadcast(evalShingles.select("sh").withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_contaminated"))

  /** The static eval-split shingle table for a documents dir (in
    * production this is a small persisted table built once per
    * benchmark release), at the same shingle width the gate probes. */
  def evalShingles(spark: org.apache.spark.sql.SparkSession, dir: String,
                   n: Int = graft.operators.Curation.ContamN): DataFrame =
    graft.operators.Curation.shingleHashesOf(
        graft.Tables.documents(spark, dir)
          .filter(col("doc_id") % graft.operators.Curation.EvalMod === 0)
          .select("doc_id", "text"),
        n)
      .select("sh")
      .distinct()
}
