package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, MapType, StringType}

/** Cross-engine deterministic hashing and canonicalization.
  *
  * The reference derives message identity from hash(payload ++
  * stable-stringify(properties minus ignored)) — see
  * /root/reference/src/deduplication.ts:11-40 (`createHasher`). Its own
  * comment notes any collision-resistant non-crypto 64/128-bit hash
  * suffices. We use the first 60 bits of md5 so the digest is
  * reproducible bit-for-bit in ANSI SQL (DuckDB oracle) while staying
  * entirely inside whole-stage codegen (no UDFs). The hot path for
  * scale-only contexts can use `xxhash64` instead (same shuffle
  * behavior, cheaper).
  */
object Hashing {

  /** 60-bit hash of a string column, reproducible in DuckDB as
    * CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT). Non-negative. */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Seeded variant for MinHash permutations / LSH planes. */
  def h64Seeded(seed: Int, c: Column): Column =
    h64(concat_ws(":", lit(seed), c))

  /** Fast non-oracle variant for pure-throughput paths. */
  def fast64(c: Column): Column = xxhash64(c)

  /** Canonical form of a JSON-object property bag with `ignored` keys
    * removed: entries sorted by key, "k=v" joined by ",". Mirrors the
    * reference's stable stringify minus DEDUPLICATION_IGNORED_PROPERTIES
    * (deduplication.ts:14-23). */
  def canonicalProps(json: Column, ignored: Seq[String]): Column =
    canonicalPropsMap(from_json(json, MapType(StringType, StringType)), ignored)

  /** Same canonicalization over an already-typed map column (the
    * envelope form — Pulsar properties are Map[String,String]). */
  def canonicalPropsMap(m: Column, ignored: Seq[String]): Column = {
    val kept =
      if (ignored.isEmpty) m
      else map_filter(m, (k, _) => !k.isin(ignored: _*))
    val entries = array_sort(map_entries(kept))
    concat_ws(",", transform(entries, e =>
      concat(e.getField("key"), lit("="), e.getField("value"))))
  }

  /** Reference-exact stable stringify of a property bag: JSON object
    * with keys SORTED and `ignored` keys removed — byte-identical to
    * `safe-stable-stringify` over Record<string,string> as the
    * reference feeds its hasher (deduplication.ts:17-23). Spark's
    * to_json provides the JSON string escaping; map_from_entries over
    * the sorted entry array fixes the key order.
    *
    * Key-order caveat: array_sort compares keys by UTF-8 bytes
    * (code-point order) while JS Array.prototype.sort compares UTF-16
    * code units, so keys mixing supplementary-plane characters with
    * U+E000–U+FFFF can sort differently. Byte-parity with the reference
    * digest is guaranteed for ASCII/BMP keys — in practice all Pulsar
    * property names. */
  def stableStringifyProps(m: Column, ignored: Seq[String]): Column = {
    val kept =
      if (ignored.isEmpty) m
      else map_filter(m, (k, _) => !k.isin(ignored: _*))
    to_json(map_from_entries(array_sort(map_entries(kept))))
  }

  /** BLAKE2b-512 of a binary column — codegen'd static call into the
    * RFC 7693 implementation ([[Blake2b]]); 64-byte digest, exactly
    * Node's createHash("BLAKE2b512"). */
  def blake2b512(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        Blake2b.getClass,
        org.apache.spark.sql.types.BinaryType,
        "hash512",
        Seq(org.apache.spark.sql.graft.Bridge.expression(c)),
        returnNullable = false))

  /** The reference's digest, byte-for-byte (deduplication.ts:25-38):
    * BLAKE2b-512 over payload bytes ‖ UTF-8 stable-stringified kept
    * properties. Lets digests interchange with an output store the
    * reference service wrote (migration/bootstrap parity). Not used by
    * the oracle-checked queries — DuckDB has no BLAKE2b; select it via
    * spark.graft.digest=blake2b (Envelope.digestFor). */
  def envelopeDigestBlake2b(payload: Column, props: Column,
                            ignored: Seq[String] = Nil): Column =
    blake2b512(concat(payload,
      encode(stableStringifyProps(props, ignored), "UTF-8")))

  /** Money-ish double → exact integer cents (avoids engine-specific
    * double→string formatting in hash inputs). */
  def valueCents(value: Column): Column =
    round(value * 100).cast("bigint")

  /** Exact integer division (`a div b`) — truncating int64 division,
    * never the double division Spark's `/` performs on integral inputs. */
  def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(a.cast("long")),
        org.apache.spark.sql.graft.Bridge.expression(b.cast("long"))))

  /** ROUND(num/den, 4) as HALF_UP on the EXACT rational num/den,
    * computed in pure int64 — (num·10⁴ + den div 2) div den, then one
    * IEEE long→double divide by 10⁴. Bit-identical across engines by
    * construction. ROUND over a double quotient is not: Spark rounds
    * the quotient double's exact decimal expansion (BigDecimal
    * HALF_UP) while DuckDB rounds the scaled double, and the two
    * diverge on boundary values — the events_gap_stats r3 regression.
    *
    * Requires integer-typed num ≥ 0 (|num| < 9.2e14 so num·10⁴ fits
    * int64 — any count/sum at report grain) and den > 0. Tie analysis:
    * for even den the +den/2 offset rounds exact .5 ties up; for odd
    * den a .5 tie is impossible (2·num·10⁴ = odd·odd has no solution),
    * so truncation after +((den−1) div 2) is still nearest. DuckDB
    * twin: ((num*10000 + den//2)//den)/10000.0 (same arithmetic in
    * int64/int128). */
  def ratio4(num: Column, den: Column): Column =
    halfUpDiv(num.cast("long") * 10000L, den) / lit(10000.0)

  /** ROUND(num/den) HALF_UP on the exact rational, pure int64:
    * (num + den div 2) div den. Exact-arithmetic building block for
    * any cross-engine-deterministic rational export (ratio4, integer
    * quality keys). num ≥ 0, den > 0. */
  def halfUpDiv(num: Column, den: Column): Column = {
    val d = den.cast("long")
    intDiv(num.cast("long") + intDiv(d, lit(2L)), d)
  }

  /** Canonical message digest for the events stream: payload columns +
    * canonical properties, timestamp excluded (deduplication.ts:24-27
    * excludes the event timestamp on purpose — it differs per replica).
    * `hasher` defaults to the oracle-reproducible md5-based h64; pass
    * `fast64` (xxhash64, fully codegen'd) for pure-throughput paths
    * where cross-engine reproducibility is not needed. */
  def eventDigest(userId: Column, eventType: Column, value: Column,
                  props: Column, ignored: Seq[String] = Nil,
                  hasher: Column => Column = h64): Column =
    hasher(concat_ws("|",
      userId.cast("string"),
      eventType,
      valueCents(value).cast("string"),
      canonicalProps(props, ignored)))

  /** Exact decimal lift for money columns: sums become order-independent
    * and bit-identical to the DuckDB oracle. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Final presentation of an exact decimal aggregate: round to cents,
    * surface as double. */
  def money2(c: Column): Column = round(c, 2).cast("double")
}
