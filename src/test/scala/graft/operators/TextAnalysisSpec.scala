package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("scrub redacts emails, urls and long digit runs (synthetic corpus has none)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "contact alice@example.com or visit https://example.com/page?id=9 ref 123456789"),
      (2L, "clean text with short num 42")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((1L, 1L, 1L)))
    assert(out(2L) === ((0L, 0L, 0L)))
    val redacted = docs.select(TextAnalysis.scrubbedText(col("text")))
      .collect().map(_.getString(0))
    assert(redacted(0) === "contact <EMAIL> or visit <URL> ref <NUM>")
    assert(redacted(1) === "clean text with short num 42")
  }

  test("tokenCount: ws tokens equal word tokens on the all-word corpus") {
    val out = TextAnalysis.tokenCount(spark, sf)
    assert(out.filter(col("n_ws_tokens") =!= col("n_word_tokens")).count() === 0)
    assert(out.filter(col("n_num_tokens") =!= 0).count() === 0)
  }

  test("quality score stays within [0,1]") {
    val out = TextAnalysis.quality(spark, sf)
    assert(out.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
  }

  test("languageId predicts 'en' when english stopwords dominate") {
    import spark.implicits._
    val out = TextAnalysis.languageId(spark, sf)
    val bad = out.filter(col("pred_lang") === "en" && col("n_en") === 0).count()
    assert(bad === 0)
  }

  test("langConfusion cells reconcile with languageId predictions and lang labels") {
    val preds = TextAnalysis.languageId(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val labels = graft.Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = labels.toSeq
      .map { case (id, l) => (l, preds(id)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = cells.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val expected = cells.toSeq.map { case ((l, p), n) =>
      (l, p, n, ratio4Model(n, rowTot(l)), l == p)
    }.sortBy(c => (c._1, c._2))
    val got = TextAnalysis.langConfusion(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got == expected)
    // each label row's shares close at 1.0 within ratio4 granularity
    got.groupBy(_._1).foreach { case (_, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) <= 0.0002 * rows.size)
    }
  }

  test("charStats matches a per-character scan model") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ws = Set(' ', '\t', '\n', '\u000B', '\f', '\r') // Java regex \s
    val expected = docs.map { case (id, t) =>
      val n = t.codePointCount(0, t.length).toLong
      val up = t.count(c => c >= 'A' && c <= 'Z').toLong
      val lo = t.count(c => c >= 'a' && c <= 'z').toLong
      val dg = t.count(c => c >= '0' && c <= '9').toLong
      val sp = t.count(ws).toLong
      val d = math.max(n, 1L)
      (id, n, up, lo, dg, sp, ratio4Model(up, d), ratio4Model(dg, d), ratio4Model(sp, d))
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.charStats(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    assert(got == expected)
  }

  test("fingerprint is order-sensitive and content-deterministic") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    df.createOrReplaceTempView("tmp_docs")
    val fp = df.select(col("doc_id"), expr(
      """aggregate(
        |  transform(filter(split(trim(text), '\\s+'), t -> t != ''),
        |            t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % 1000000007),
        |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) !== fp(2L))
  }
}
