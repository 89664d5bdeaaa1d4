package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 panels: graph-index health, cross-language dup matrix,
  * token-count Gini — each checked against an independent in-memory
  * model or a set-algebra identity over the operator it summarizes. */
class Round9PanelsSpec extends SparkSpec {

  test("graphDegreeStats reconciles with the shared edge list; degree ≤ 2M") {
    val edges = Similarity.graphEdgesShared(spark, sf)
    val stats = Similarity.graphDegreeStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Σ degree·n_nodes == |edges|, Σ n_nodes == |nodes with out-edges|
    assert(stats.map(t => t._1 * t._2).sum == edges.count())
    assert(stats.map(_._2).sum ==
      edges.select("src").distinct().count())
    // symmetrized top-M keeps out-degree ≤ 2M; ring guarantees ≥ 1
    assert(stats.forall(t => t._1 >= 1 && t._1 <= 2L * Similarity.GraphM))
    // mean cosine is a valid micro-lifted cosine
    assert(stats.forall(t => t._3 >= -1000000L && t._3 <= 1000000L))
  }

  test("crossLangDup rolls up exactly the verified near-dup pair set") {
    val pairs = MinHashLSH.nearDupPairs(spark, sf)
    val m = MinHashLSH.crossLangDup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(m.map(_._3).sum == pairs.count())
    // unordered pair canonicalization: lang_a <= lang_b, no dup cells
    assert(m.forall(t => t._1 <= t._2))
    assert(m.map(t => (t._1, t._2)).distinct.length == m.length)
    // shares are ratio4 of the total and sum to ~1
    val tot = m.map(_._3).sum.toDouble
    m.foreach(t => assert(math.abs(t._4 - t._3 / tot) <= 1e-4 + 1e-12))
  }

  test("tokenGini matches hand-computed values on a fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gini").toString
    val doc = (id: Long, src: String, n: Int) =>
      (id, ("tok " * n).trim, "en", src, n.toLong)
    (Seq(
      // equal lengths -> gini 0
      doc(1, "flat", 5), doc(2, "flat", 5), doc(3, "flat", 5),
      // one giant among stubs: x=(0,0,0,10) -> G=(2*40-5*10)/(4*10)=0.75
      (4L, null.asInstanceOf[String], "en", "spike", 0L),
      (5L, "", "en", "spike", 0L),
      (6L, "   ", "en", "spike", 3L),
      doc(7, "spike", 10),
      // all-empty source -> NULL gini (no tokens)
      (8L, "", "en", "void", 0L))
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = CorpusStats.tokenGini(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got("flat") == ((3L, 15L, Some(0.0))))
    assert(got("spike") == ((4L, 10L, Some(0.75))))
    assert(got("void") == ((1L, 0L, None)))
  }
}
