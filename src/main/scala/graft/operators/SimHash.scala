package graft.operators

import graft.functions.Hashing.h64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 32-bit signature per document
  * from its shingle hashes (majority vote per bit), then byte-banded
  * candidate generation (4 bands of 8 bits — pigeonhole: any pair at
  * Hamming ≤ 3 shares a whole byte; we verify candidates up to hd 4)
  * and exact Hamming filtering. Signature state per doc is one int64,
  * so the whole pipeline is groupBy/join shuffles on uniform keys.
  */
object SimHash {

  val Bits = 32
  val HammingMax = 4

  /** Per-doc 32-bit simhash from distinct shingle features. */
  def signatures(sh: DataFrame): DataFrame = {
    val bitVotes = sh
      .withColumn("h", h64(col("shingle")))
      .withColumn("b", explode(sequence(lit(0), lit(Bits - 1))))
      .groupBy("doc_id", "b")
      .agg(sum(expr("CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END")).as("s"))
    bitVotes
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(0L))
        .cast("long").as("simhash"))
  }

  /** #10: near-dup pairs at Hamming distance ≤ `HammingMax`. */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = signatures(DocDedup.docShingles(spark, dir))
    val bands = sig.withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("byte", expr("shiftright(simhash, 8 * band) & 255"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.byte") === col("y.byte") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("x.simhash").as("s1"),
              col("y.doc_id").as("d2"), col("y.simhash").as("s2"))
      .distinct()
    cand
      .withColumn("hd", expr("cast(bit_count(s1 ^ s2) as bigint)"))
      .filter(col("hd") <= HammingMax)
      .select("d1", "d2", "hd")
      .orderBy("d1", "d2")
  }
}
