package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass shingling: tokenize on whitespace and emit the
  * distinct n-gram shingles of a document in first-occurrence order.
  *
  * Composable form (`split` → `transform(sequence(...))` →
  * `array_distinct`) allocates per-element lambda frames and
  * intermediate arrays per row — measurably the hot spot of every
  * shingle-based operator. One eval doing the whole pass is ~5× faster
  * and byte-identical in output (first-occurrence distinct order, same
  * single-space joining), so oracle hashes are unchanged.
  *
  * Codegen: `doGenCode` emits a direct call to the `compute` kernel via
  * a reference object, so the expression participates in whole-stage
  * codegen — no interpreted-row fallback boundary around the scan
  * stage it runs in.
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleArray", this, classOf[ShingleArray].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): ShingleArray =
    copy(child = c)
}

/** Fused per-document term counting: tokenize on whitespace and emit
  * one (term, c) struct per DISTINCT term, in first-occurrence order.
  *
  * This is the scan-stage replacement for the
  * `explode(tokens) → groupBy(doc_id, term)` pattern: that plan
  * shuffles the corpus at TOKEN grain (every occurrence crosses the
  * exchange carrying its doc_id) just to reach the per-doc distinct
  * counts this kernel computes locally in one pass. Downstream term
  * rollups then need only ONE exchange, at vocabulary grain, with
  * map-side combine collapsing each task to its local vocab first —
  * the plan shape a 100 TB corpus needs (measured: corpus_zipf at
  * native sf10 fell 112 s → one term-keyed shuffle, see PLANS.md
  * round 14). tf = Σc and df = one row per (doc, term) are identical
  * to the two-stage spelling, so oracle hashes are unchanged. */
case class TermCountArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    // mutable long[] cells: one allocation per DISTINCT key — the
    // boxed merge() spelling allocated a java.lang.Long per token
    // OCCURRENCE, the measured per-row constant that made the kernel
    // lose to the interpreted lambda at small corpus scales
    val counts = new java.util.LinkedHashMap[String, Array[Long]](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val cell = counts.get(toks(i))
      if (cell == null) counts.put(toks(i), Array(1L)) else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCountArray", this, classOf[TermCountArray].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): TermCountArray =
    copy(child = c)
}

/** Fused per-document adjacent-pair counting: tokenize on whitespace
  * and emit one (pair, c) struct per DISTINCT adjacent token bigram
  * ("a b"), in first-occurrence order.
  *
  * The scan-stage replacement for the
  * `explode(transform(sequence(...), i -> concat_ws(...)))` bigram
  * derivation: that spelling evaluates its lambda INTERPRETED per
  * token (the WindowHashArray lesson — HOF lambdas sit outside
  * whole-stage codegen) and ships the corpus at bigram-occurrence
  * grain into the exchange. With per-doc counts computed in the scan,
  * the downstream pair rollup shuffles only per-doc DISTINCT pairs
  * and map-side combine collapses to local vocab first. Σc per pair
  * equals the occurrence count, so oracle hashes are unchanged. */
case class PairCountArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pair", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_counts"

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    // mutable long[] cells (see TermCountArray.compute): no boxed Long
    // per bigram occurrence
    val counts = new java.util.LinkedHashMap[String, Array[Long]](toks.length * 2)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < toks.length - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      val key = sb.toString
      val cell = counts.get(key)
      if (cell == null) counts.put(key, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairCountArray", this, classOf[PairCountArray].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): PairCountArray =
    copy(child = c)
}

/** Fused BPE symbol-pair counting over the WRAPPED word form
  * "(a)(b)(ab)": emits one ("l r", c) struct per distinct adjacent
  * symbol pair, in first-occurrence order — the per-round inner loop
  * of BPE training in one compiled pass, replacing the
  * replace → trim → split → transform(sequence) → explode chain
  * (whose lambda evaluates interpreted, per symbol, per round).
  * Symbols are the paren-group contents; under 2 symbols → empty
  * array (the old `size >= 2` filter becomes a free no-op). Σ(c·n)
  * per pair equals the old occurrence×frequency sum, so the trained
  * merges are identical. */
case class SymbolPairCountArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pair", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "symbol_pair_counts"

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val s = v.toString
    // parse "(sym)(sym)..." — symbols never contain parens (spec'd by
    // the [a-z0-9]+ vocab gate upstream)
    val syms = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '(') {
        val close = s.indexOf(')', i + 1)
        if (close < 0) { i = s.length }
        else { syms += s.substring(i + 1, close); i = close + 1 }
      } else i += 1
    }
    if (syms.length < 2) return new GenericArrayData(Array.empty[Any])
    // mutable long[] cells (see TermCountArray.compute): no boxed Long
    // per symbol-pair occurrence
    val counts = new java.util.LinkedHashMap[String, Array[Long]](syms.length * 2)
    val sb = new java.lang.StringBuilder(32)
    var j = 0
    while (j < syms.length - 1) {
      sb.setLength(0)
      sb.append(syms(j)).append(' ').append(syms(j + 1))
      val key = sb.toString
      val cell = counts.get(key)
      if (cell == null) counts.put(key, Array(1L)) else cell(0) += 1L
      j += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("symbolPairCountArray", this,
      classOf[SymbolPairCountArray].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): SymbolPairCountArray =
    copy(child = c)
}

/** Fused order-sensitive document fingerprint: the rolling polynomial
  * hash `fold((acc·31 + h₆₀(tok) mod p) mod p)` with
  * h₆₀ = conv(substring(md5(tok),1,15),16,10) and p = 1e9+7 — the
  * exact fold `text_fingerprint`'s oracle states in DuckDB
  * list_reduce. The composable spelling ran the md5 → hex string →
  * Conv radix parse INTERPRETED per token inside an aggregate()
  * lambda (the same frames the sf10 profile flagged for the
  * rolling-window family); this kernel digests bytes directly (top
  * 60 bits of the md5, no hex/string detour), one MessageDigest per
  * task. Bit-identical by construction. */
case class FingerprintHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint_hash"

  private val P = 1000000007L

  /** Thread-confined digest: tasks usually get their own deserialized
    * expression copy, but driver-side constant folding (e.g.
    * ConvertToLocalRelation during concurrent query BUILDS sharing a
    * memoized Column) can evaluate ONE instance from many threads —
    * a plain per-instance digest would silently corrupt hashes there. */
  @transient private lazy val md: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): Long = {
    val digest = md.get()
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val d = digest.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits: 7 full bytes + high nibble of
      // the 8th — matches conv(substring(md5(t),1,15),16,10)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      acc = (acc * 31L + h % P) % P
      i += 1
    }
    acc
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fingerprintHash", this, classOf[FingerprintHash].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): FingerprintHash =
    copy(child = c)
}

/** Fused Gopher-repetition kernel: the ENTIRE per-document repetition
  * signal (bigram occurrences, hottest-bigram count, trigram
  * occurrences, duplicated-trigram occurrences) in one scan-stage
  * pass, as struct(n2, top2, n3, dup3); null for docs under 3 tokens.
  *
  * The signal is per-DOC, so the former explode → groupBy(doc, n,
  * gram) → groupBy(doc) plan shuffled the corpus at ~2× token grain
  * (bigram+trigram rows with string keys) only to collapse right back
  * to one row per doc — 125 s at native sf10. This kernel removes the
  * exchange entirely: the only remaining cost is the scan and the
  * O(docs) output sort. Values are identical (n2 = Σ bigram counts,
  * top2 = max, dup3 = Σ counts ≥ 2), so oracle hashes are unchanged. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("dup3", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): InternalRow = {
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) return null
    val bi = new java.util.HashMap[String, Long](toks.length * 2)
    val tri = new java.util.HashMap[String, Long](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < toks.length - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      bi.merge(sb.toString, 1L, (a, b) => a + b)
      if (i < toks.length - 2) {
        sb.append(' ').append(toks(i + 2))
        tri.merge(sb.toString, 1L, (a, b) => a + b)
      }
      i += 1
    }
    var top2 = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val c = bit.next(); if (c > top2) top2 = c }
    var dup3 = 0L
    val tit = tri.values().iterator()
    while (tit.hasNext) { val c = tit.next(); if (c >= 2L) dup3 += c }
    InternalRow(toks.length - 1L, top2, toks.length - 2L, dup3)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.compute($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** Fused rolling-window hashing: tokenize on whitespace and emit one
  * (pos, h) struct per w-token window (stride 1, pos 1-based), where
  * h is the corpus hash h64(window text joined by ' ') — BIT-IDENTICAL
  * to `h64(concat_ws(" ", slice(t, i, w)))`, i.e. the first 60 bits of
  * the md5 of the UTF-8 window bytes.
  *
  * The composable spelling put that h64 inside a `transform(...)`
  * lambda — and higher-order-function lambdas evaluate INTERPRETED
  * (md5 → hex string → Conv radix parse per element, outside
  * whole-stage codegen): the sf10 profile showed `Conv.nullSafeEval` /
  * `NumberConverter.convert` as the hot frames of every rolling-window
  * panel (156–180 s each at 46.6M windows). This kernel runs the
  * whole derivation in one compiled pass — one MessageDigest reused
  * across a document's windows, bytes straight from the window
  * builder, hex parsed without the string detour. Empty array under
  * w tokens (the old `size(t) >= w` filter becomes a free no-op). */
case class WindowHashArray(child: Expression, w: Int, stride: Int = 1)
    extends UnaryExpression {

  require(w >= 1, "window size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "window_hashes"

  /** Thread-confined digest (see [[FingerprintHash.md]]): reset between
    * windows AND between rows — getInstance("MD5") per row would re-run
    * provider lookup for every document, while a bare per-instance
    * field would corrupt hashes if driver-side folding ever evaluates
    * one shared instance from concurrent query-build threads. */
  @transient private lazy val md: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Single-pass kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val toks = v.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val digest = md.get()
    val sb = new java.lang.StringBuilder(128)
    // pos = window ORDINAL (1-based); at stride 1 that coincides with
    // the window's first-token position. stride = w is the
    // non-overlapping chunk grid of `dedup_chunks`, emitting exactly
    // floor(len/w) full chunks — identical hashes to the stride-1
    // windows at those offsets.
    val out = new Array[Any]((toks.length - w) / stride + 1)
    var i = 0
    var ord = 0L
    while (i <= toks.length - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits: 7 full bytes + the high
      // nibble of the 8th — matches conv(substring(md5(x),1,15),16,10)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      ord += 1L
      out(ord.toInt - 1) = InternalRow(ord, h)
      i += stride
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowHashArray", this, classOf[WindowHashArray].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WindowHashArray =
    copy(child = c)
}

object TextExpressions {
  /** Column API: distinct n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column =
    column(ShingleArray(expression(text), n))

  /** Column API: (pos, h64) per rolling w-token window, stride 1. */
  def windowHashes(text: Column, w: Int): Column =
    column(WindowHashArray(expression(text), w))

  /** Column API: (ordinal, h64) per w-token window at the given stride
    * — stride = w is the non-overlapping chunk grid. */
  def windowHashes(text: Column, w: Int, stride: Int): Column =
    column(WindowHashArray(expression(text), w, stride))

  /** Column API: per-document (term, c) counts, first-occurrence order. */
  def termCounts(text: Column): Column =
    column(TermCountArray(expression(text)))

  /** Column API: per-document adjacent-bigram (pair, c) counts. */
  def pairCounts(text: Column): Column =
    column(PairCountArray(expression(text)))

  /** Column API: BPE symbol-pair (pair, c) counts over a wrapped word. */
  def symbolPairCounts(wrapped: Column): Column =
    column(SymbolPairCountArray(expression(wrapped)))

  /** Column API: rolling polynomial document fingerprint (mod 1e9+7). */
  def fingerprintHash(text: Column): Column =
    column(FingerprintHash(expression(text)))

  /** Column API: fused per-doc repetition signal (null under 3 tokens). */
  def repetitionStats(text: Column): Column =
    column(RepetitionStats(expression(text)))
}
