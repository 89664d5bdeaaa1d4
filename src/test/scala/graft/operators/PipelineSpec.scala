package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("cleanDocs output respects every gate") {
    val out = Pipeline.cleanDocs(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("quality_score") < Pipeline.QualityMin).count() === 0)
    // no surviving doc is the larger side of a verified near-dup pair
    val losers = MinHashLSH.nearDupPairs(spark, sf)
      .select("d2").collect().map(_.getLong(0)).toSet
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(losers).isEmpty)
    // english-only gate
    val langs = TextAnalysis.languageId(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(ids.forall(langs(_) == "en"))
  }
}
