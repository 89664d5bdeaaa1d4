package graft.plans

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The round-15 fused kernels vs their composable spellings — the
  * bit-identity proofs that let the bpe/bigram/pmi/fingerprint family
  * move onto scan-stage kernels with oracle hashes unchanged. */
class Round15KernelsSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf).select("doc_id", "text")

  test("pairCounts: Σc per (doc, pair) == the composable bigram explode, corpus-wide") {
    val fused = docs
      .select(col("doc_id"), explode(TextExpressions.pairCounts(col("text"))).as("pc"))
      .select(col("doc_id"), col("pc.pair"), col("pc.c"))
    val composable = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2), i =>
          concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .as("pair"))
      .groupBy("doc_id", "pair").agg(count(lit(1)).as("c"))
    assert(fused.exceptAll(composable).isEmpty && composable.exceptAll(fused).isEmpty)
  }

  test("pairCounts edge cases: empty, single token, repeated bigrams, first-occurrence order") {
    import spark.implicits._
    val rows = Seq((1L, ""), (2L, "solo"), (3L, "a b a b a"), (4L, "  x   y  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextExpressions.pairCounts(col("text")).as("p"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1))))
      .toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L) == Seq(("a b", 2L), ("b a", 2L)))
    assert(rows(4L) == Seq(("x y", 1L)))
  }

  test("symbolPairCounts: wrapped-word pairs == the split+transform round derivation") {
    import spark.implicits._
    // wrapped forms as the BPE loop produces them, including merged
    // multi-char symbols and degenerate single-symbol words
    val words = Seq("(l)(o)(w)(e)(r)", "(lo)(w)(est)", "(a)", "(a)(b)(a)(b)")
      .toDF("s")
    val fused = words
      .select(col("s"), explode(TextExpressions.symbolPairCounts(col("s"))).as("pc"))
      .select(col("s"), col("pc.pair"), col("pc.c"))
    val composable = words
      .withColumn("sy", split(trim(expr("replace(s, ')(', ' ')"), "()"), " "))
      .filter(size(col("sy")) >= 2)
      .select(col("s"),
        explode(transform(sequence(lit(1), size(col("sy")) - 1),
          i => concat(element_at(col("sy"), i), lit(" "),
            element_at(col("sy"), i + 1)))).as("pair"))
      .groupBy("s", "pair").agg(count(lit(1)).as("c"))
    assert(fused.exceptAll(composable).isEmpty && composable.exceptAll(fused).isEmpty)
  }

  test("fingerprintHash == the aggregate(transform(md5→conv)) fold, corpus-wide") {
    val fused = docs.select(col("doc_id"),
      TextExpressions.fingerprintHash(col("text")).as("fp"))
    val composable = docs.select(col("doc_id"), expr(
      """aggregate(
        |  transform(filter(split(trim(text), '\\s+'), t -> t != ''),
        |            t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % 1000000007),
        |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin).as("fp"))
    assert(fused.exceptAll(composable).isEmpty && composable.exceptAll(fused).isEmpty)
    // empty text folds to the 0 seed on both sides
    import spark.implicits._
    assert(Seq("").toDF("text")
      .select(TextExpressions.fingerprintHash(col("text"))).head.getLong(0) == 0L)
  }
}
