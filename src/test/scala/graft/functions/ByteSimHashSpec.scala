package graft.functions

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class ByteSimHashSpec extends SparkSpec {

  private def payloads = Multimodal.withPayload(spark, sf)
    .select(col("doc_id"), col("payload"))

  test("fused signature is bit-equal to the explode-form pipeline on the corpus") {
    val fused = payloads
      .select(col("doc_id"),
        ByteSimHash.byteSimHash(col("payload"),
          Multimodal.ShingleBytes, Multimodal.SampleMod).as("simhash"))
      .filter(col("simhash") =!= ByteSimHash.NoSignature)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exploded = Multimodal.explodedSignaturesOf(payloads)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size === exploded.size)
    assert(fused === exploded)
  }

  test("kernel edge cases: null, short, featureless payloads are sentinel") {
    assert(ByteSimHash.signature(null, 8, 8) === ByteSimHash.NoSignature)
    assert(ByteSimHash.signature(Array.emptyByteArray, 8, 8) === ByteSimHash.NoSignature)
    assert(ByteSimHash.signature("1234567".getBytes("UTF-8"), 8, 8)
      === ByteSimHash.NoSignature) // 7 bytes < window
    // sampleMod = 1 keeps every window: an 8-byte payload has exactly one
    // window, whose h64 IS the signature (a single vote sets its own bits)
    val one = "12345678".getBytes("UTF-8")
    val hexWin = one.map(b => f"${b & 0xff}%02X").mkString
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(hexWin.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    val h = java.lang.Long.parseLong(md5hex.take(15), 16)
    assert(ByteSimHash.signature(one, 8, 1) === h)
  }

  test("signature is shift-robust: a prefix insertion preserves most bits") {
    // content-defined sampling: inserting bytes at the front must leave
    // the windows of the unchanged suffix selected identically
    val base = ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")
    val shifted = ("XY".getBytes("UTF-8") ++ base)
    val s1 = ByteSimHash.signature(base, Multimodal.ShingleBytes, Multimodal.SampleMod)
    val s2 = ByteSimHash.signature(shifted, Multimodal.ShingleBytes, Multimodal.SampleMod)
    assert(s1 != ByteSimHash.NoSignature && s2 != ByteSimHash.NoSignature)
    assert(java.lang.Long.bitCount(s1 ^ s2) <= graft.operators.SimHash.HammingMax)
  }

  test("nearDupPairsOf over the fused kernel matches the corpus oracle shape") {
    val pairs = Multimodal.nearDupPairs(spark, sf).collect()
    // pairs are ordered, Hamming-bounded, and symmetric-free (d1 < d2)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= graft.operators.SimHash.HammingMax)
    }
  }
}
