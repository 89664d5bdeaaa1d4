package graft.operators

import graft.functions.Hashing.h64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 64-bit signature per document
  * from its shingle hashes (majority vote per bit), then byte-banded
  * candidate generation (8 bands of 8 bits — pigeonhole: any pair at
  * Hamming ≤ 7 shares a whole byte, so recall is EXACT for the
  * HammingMax=4 contract) and exact Hamming filtering. Signature state
  * per doc is one int64, so the whole pipeline is groupBy/join shuffles
  * on uniform keys.
  *
  * Note: the feature hash (md5-derived h64) carries 60 bits of entropy,
  * so bits 60–63 of the signature are constant-zero in both engines —
  * harmless (they vote unanimously) and cross-engine identical.
  */
object SimHash {

  val Bits = 64
  val Bands = 8
  val HammingMax = 4

  /** Per-doc 64-bit simhash from distinct shingle features. */
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
    val bands = sig.withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
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
