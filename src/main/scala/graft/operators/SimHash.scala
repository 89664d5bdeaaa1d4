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

  /** Per-doc 64-bit simhash from distinct shingle features.
    *
    * One aggregation, NO bit explode: the ±1 vote sum for bit b is
    * `2·ones(b) − n`, so the majority test `s > 0` is exactly
    * `2·ones(b) > n` — 64 popcount-style sums + one count per doc,
    * all partial-aggregable, instead of fanning every shingle out
    * 64×. Values are identical to the explode formulation (and the
    * oracle, which keeps the ±1 formulation). */
  def signatures(sh: DataFrame): DataFrame = {
    val th = sh.withColumn("h", h64(col("shingle")))
    val ones = (0 until Bits).map(b =>
      sum(expr(s"shiftright(h, $b) & 1")).as(s"o$b"))
    val aggs = ones :+ count(lit(1)).as("n")
    th.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until Bits).map(b =>
          when(col(s"o$b") * 2 > col("n"), lit(1L << b)).otherwise(0L))
          .reduce(_ + _).cast("long").as("simhash"))
  }

  /** #10: near-dup pairs at Hamming distance ≤ `HammingMax`. Byte
    * buckets get the same hot-bucket cap as the MinHash bands — simhash
    * bytes are NOT uniform (boilerplate corpora share bytes), so one
    * hot byte would fan the self-join out quadratically. */
  def nearDupPairs(spark: SparkSession, dir: String,
                   maxBucket: Int = MinHashLSH.MaxBucketSize): DataFrame =
    nearDupPairsOfShingles(DocDedup.docShingles(spark, dir), maxBucket)

  /** #10 over an arbitrary (doc_id, shingle) frame. */
  def nearDupPairsOfShingles(sh: DataFrame,
                             maxBucket: Int = MinHashLSH.MaxBucketSize): DataFrame =
    nearDupPairsOfSignatures(signatures(sh), maxBucket)

  /** Banding + exact-Hamming stage over a precomputed (doc_id, simhash)
    * frame — the seam a fused signature kernel (ByteSimHash) plugs into
    * without touching the proven candidate-generation code. */
  def nearDupPairsOfSignatures(sig: DataFrame,
                               maxBucket: Int = MinHashLSH.MaxBucketSize): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "byte")
    val bands = sig.withColumn("band", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("byte", expr("shiftright(simhash, 8 * band) & 255"))
      .withColumn("bsz", count(lit(1)).over(wB))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
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
