package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** Fused content-defined byte-shingle SimHash — the native form of the
  * `multimodal_phash_dedup` signature stage (Multimodal.nearDupPairsOf).
  *
  * Semantics are bit-identical to the declarative pipeline it replaces
  * (hex(payload) → explode every W-byte window → keep windows whose
  * h64 % SampleMod == 0 → per-doc 64-bit majority vote over the kept
  * window hashes), where h64(s) = first 15 hex chars of md5(s) parsed
  * base-16 (graft.functions.Hashing.h64) and the hashed string is the
  * UPPERCASE hex of the window (Spark's `hex`). The DuckDB oracle keeps
  * the explode formulation; ByteSimHashSpec pins bit-parity against it.
  *
  * Why fused: the declarative form materializes one generator row plus
  * one 2W-char substring PER BYTE OFFSET of every payload — pure
  * constant overhead that made the query the 3rd most expensive at
  * sf0.1 and would dominate at real media sizes. This kernel makes one
  * pass over the payload with zero row amplification: a reused
  * ThreadLocal MessageDigest, a reused window buffer, 64 vote counters.
  * Invoked via StaticInvoke so the call stays inside whole-stage
  * codegen (the Blake2b discipline, Hashing.scala).
  */
object ByteSimHash {

  /** Sentinel for "no sampled window" (payload shorter than the window,
    * or no window hash divided the sampling modulus). h64 carries 60
    * bits, so every real signature has bits 60–63 zero and can never
    * equal -1; callers filter the sentinel exactly like the declarative
    * form's absent-doc semantics. */
  val NoSignature: Long = -1L

  private val HexUpper = "0123456789ABCDEF".getBytes("US-ASCII")

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass signature kernel: windowBytes-wide sliding windows,
    * sampled at h64 % sampleMod == 0, majority-voted per bit. Static +
    * primitive-typed so StaticInvoke codegen emits a direct call. */
  def signature(payload: Array[Byte], windowBytes: Int, sampleMod: Int): Long = {
    if (payload == null || payload.length < windowBytes) return NoSignature
    val md = md5Local.get()
    val hexWin = new Array[Byte](2 * windowBytes) // uppercase hex of the window
    val digest = new Array[Byte](16)
    val ones = new Array[Long](60) // h64 is 60-bit: bits 60-63 never vote 1
    var n = 0L
    var i = 0
    val last = payload.length - windowBytes
    while (i <= last) {
      var j = 0
      while (j < windowBytes) {
        val b = payload(i + j) & 0xff
        hexWin(2 * j) = HexUpper(b >>> 4)
        hexWin(2 * j + 1) = HexUpper(b & 0xf)
        j += 1
      }
      md.reset()
      md.update(hexWin)
      md.digest(digest, 0, 16)
      // first 15 hex chars of the md5 = first 60 bits = beLong(d0..d7) >>> 4
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
      h = h >>> 4
      if (h % sampleMod == 0) {
        n += 1
        var b = 0
        while (b < 60) { ones(b) += (h >>> b) & 1L; b += 1 }
      }
      i += 1
    }
    if (n == 0L) NoSignature
    else {
      var sig = 0L
      var b = 0
      while (b < 60) {
        if (2L * ones(b) > n) sig |= 1L << b
        b += 1
      }
      sig
    }
  }

  /** Column form: 64-bit simhash of a binary payload column, or
    * [[NoSignature]]. Codegen'd static call — no UDF, no row fan-out. */
  def byteSimHash(payload: Column, windowBytes: Int, sampleMod: Int): Column =
    Bridge.column(StaticInvoke(
      ByteSimHash.getClass,
      LongType,
      "signature",
      Seq(Bridge.expression(payload),
        org.apache.spark.sql.catalyst.expressions.Literal(windowBytes),
        org.apache.spark.sql.catalyst.expressions.Literal(sampleMod)),
      returnNullable = false))
}
