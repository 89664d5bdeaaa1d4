package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocDedupSpec extends SparkSpec {

  test("exactDocs collapses the case-noise replica of every doc") {
    val out = DocDedup.exactDocs(spark, sf)
    // every digest group holds the original and its upper-cased replica
    assert(out.filter(col("n_copies") < 2).count() === 0)
    // keeper is always the original id (min)
    assert(out.filter(col("keep_id") >= 100000L).count() === 0)
  }

  test("ngramJaccard emits symmetric-free ordered pairs above tau") {
    val out = DocDedup.ngramJaccard(spark, sf, tau = 0.5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("shingles3 of a short doc is empty, of 'a b c d' has two shingles") {
    import spark.implicits._
    val df = Seq("a b", "a b c d").toDF("text")
      .select(DocDedup.shingles3(TextAnalysis.tokens(col("text"))).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).isEmpty)
    assert(rows(1) === Seq("a b c", "b c d"))
  }
}
