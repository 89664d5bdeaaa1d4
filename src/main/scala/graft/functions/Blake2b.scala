package graft.functions

/** BLAKE2b-512 (RFC 7693), unkeyed, 64-byte digest — the digest the
  * reference's `createHasher` produces via Node/OpenSSL ("BLAKE2b512",
  * /root/reference/src/deduplication.ts:25-38). The JDK ships no
  * BLAKE2b provider, so this is a direct implementation of the RFC's
  * sequential (non-tree) mode: parameter block = digest_length 64,
  * fanout 1, depth 1, everything else zero, folded into h0 as
  * 0x01010040.
  *
  * Byte-for-byte parity with the reference lets digests in an output
  * store written by the reference service be compared/bootstrapped
  * directly during a migration. It is NOT used by the oracle-checked
  * queries (DuckDB has no BLAKE2b; the cross-engine digest stays h64).
  */
object Blake2b {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def readLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** One compression: h ← F(h, block, bytesSoFar, last). */
  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) { m(i) = readLongLE(block, off + i * 8); i += 1 }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // t0 (message length < 2^64 here, t1 stays 0)
    if (last) v(14) = ~v(14)
    @inline def g(r: Int, i: Int, a: Int, b: Int, c: Int, d: Int): Unit = {
      val x = m(Sigma(r)(2 * i)); val y = m(Sigma(r)(2 * i + 1))
      v(a) = v(a) + v(b) + x
      v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 63)
    }
    var r = 0
    while (r < 12) {
      g(r, 0, 0, 4, 8, 12); g(r, 1, 1, 5, 9, 13)
      g(r, 2, 2, 6, 10, 14); g(r, 3, 3, 7, 11, 15)
      g(r, 4, 0, 5, 10, 15); g(r, 5, 1, 6, 11, 12)
      g(r, 6, 2, 7, 8, 13); g(r, 7, 3, 4, 9, 14)
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** BLAKE2b-512 of `data`; 64-byte digest. Called from codegen via
    * StaticInvoke — must stay a pure static-forwardable method. */
  def hash512(data: Array[Byte]): Array[Byte] = {
    val h = IV.clone()
    h(0) ^= 0x01010040L // digest_length=64, key_length=0, fanout=1, depth=1
    val n = data.length
    // all full blocks except the one that must be flagged last
    var off = 0
    while (n - off > 128) {
      compress(h, data, off, off + 128L, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    System.arraycopy(data, off, lastBlock, 0, n - off)
    compress(h, lastBlock, 0, n.toLong, last = true)
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) { out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }
}
