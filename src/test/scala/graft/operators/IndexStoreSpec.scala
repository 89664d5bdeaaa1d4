package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** A search over PERSISTED index artifacts must equal the in-session
  * build bit for bit — floats/doubles round-trip parquet exactly, so
  * any drift would mean the save path dropped or re-derived an
  * artifact instead of persisting it. */
class IndexStoreSpec extends SparkSpec {

  private lazy val indexDir = {
    val d = Files.createTempDirectory("graft-annidx").toString
    Similarity.saveIndex(spark, sf, d)
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("saved ivf-kmeans search equals the in-session build") {
    val got = rows(Similarity.searchSavedIvfKmeans(spark, sf, indexDir))
    val want = rows(Similarity.ivfKmeansTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("saved ivf+pq search equals the in-session build") {
    val got = rows(Similarity.searchSavedIvfPq(spark, sf, indexDir))
    val want = rows(Similarity.ivfPqTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("saved lsh search equals the in-session build") {
    val got = rows(Similarity.searchSavedLsh(spark, sf, indexDir))
    val want = rows(Similarity.lshTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }
}
