package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native second-moment aggregate: one buffer carrying n, the
  * per-dim sums and every upper-triangle cross-product — the merge
  * path (partial aggregation) must be exercised, so the fixtures run
  * multi-partition. */
class GramSumAggSpec extends SparkSpec {

  private val d = 4

  /** Deterministic small corpus: 23 vectors of dim 4 over ≥5
    * partitions so update AND merge both run. */
  private lazy val vecs: Seq[Array[Long]] =
    (0 until 23).map(r => Array.tabulate(d)(i => ((r * 31 + i * 7) % 11 - 5).toLong))

  test("moment buffer equals the naive driver model across partitions") {
    import spark.implicits._
    val df = vecs.map(_.toSeq).toDF("u").repartition(5)
    val got = df.agg(GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
      .head().getSeq[Long](0).toArray

    val expect = new Array[Long](1 + d + d * (d + 1) / 2)
    vecs.foreach { v =>
      expect(0) += 1
      var p = 1 + d
      for (i <- 0 until d) {
        expect(1 + i) += v(i)
        for (j <- i until d) { expect(p) += v(i) * v(j); p += 1 }
      }
    }
    assert(got.toSeq === expect.toSeq)
  }

  test("upper-triangle offset formula addresses the buffer it documents") {
    import spark.implicits._
    val df = vecs.map(_.toSeq).toDF("u").repartition(3)
    val g = df.agg(GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
      .head().getSeq[Long](0).toArray
    // p_{i,j} at 1 + d + i·d − i(i−1)/2 + (j−i): spot-check every cell
    for (i <- 0 until d; j <- i until d) {
      val off = 1 + d + i * d - i * (i - 1) / 2 + (j - i)
      val naive = vecs.map(v => v(i) * v(j)).sum
      assert(g(off) === naive, s"cell ($i,$j) at offset $off")
    }
  }

  test("null vectors are skipped, not counted") {
    import spark.implicits._
    val df = (vecs.map(v => Some(v.toSeq)) ++ Seq(None, None))
      .toDF("u").repartition(4)
    val g = df.agg(GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
      .head().getSeq[Long](0)
    assert(g(0) === vecs.length.toLong)
  }

  test("a wrong-dimension vector fails loudly") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L)).toDF("u")
    val ex = intercept[Exception] {
      df.agg(GramSumAggFunctions.gramSumAgg(col("u"), d)).head()
    }
    assert(ex.getMessage.contains("gram_sum_agg") ||
      ex.getCause != null && ex.getCause.getMessage.contains("gram_sum_agg"))
  }
}
