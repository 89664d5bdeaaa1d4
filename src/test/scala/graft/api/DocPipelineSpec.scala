package graft.api

import graft.SparkSpec

/** The fluent API must be sugar, not a second implementation: its
  * composed plan produces exactly the hand-built Pipeline.cleanDocs
  * rows (which are oracle-checked as pipeline_clean_docs). */
class DocPipelineSpec extends SparkSpec {

  test("fluent pipeline equals the hand-composed cleanDocs plan") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val fluent = DocPipeline(docs)
      .exactDedup()
      .nearDupRemove(tau = 0.5)
      .qualityFilter(min = graft.operators.Pipeline.QualityMin)
      .languageFilter("en")
      .fingerprint()
      .cleaned
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the independent hand-composed formulation is the cross-check
    // (cleanDocs itself is now built on DocPipeline)
    val want = graft.operators.Pipeline.cleanDocsComposed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(fluent.toSeq === want.toSeq)
    assert(fluent.nonEmpty)
  }

  test("packed/mixReport terminals equal the whole-corpus operators on an identity pipeline") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text", "source")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toList).toSeq
    // no filtering stages → the pipeline's frame IS the corpus, so the
    // terminals must reproduce the oracle-checked operators exactly
    assert(rows(DocPipeline(docs).packed()) ===
      rows(graft.operators.Pipeline.packSequences(spark, sf)))
    assert(rows(DocPipeline(docs).mixReport) ===
      rows(graft.operators.Curation.sourceMixReport(spark, sf)))
    assert(rows(DocPipeline(docs).sharded().orderBy("doc_id")) ===
      rows(graft.operators.Pipeline.shardAssignments(spark, sf).orderBy("doc_id")))
    // and after a filtering stage the packing is over SURVIVORS only:
    // offsets re-base to the surviving corpus
    val packedFiltered = DocPipeline(docs)
      .qualityFilter(min = graft.operators.Pipeline.QualityMin).packed()
    val perDoc = packedFiltered.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perDoc.nonEmpty && perDoc.length < docs.count())
    var off = 0L
    perDoc.foreach { case (_, n, start) => assert(start == off); off += n }
  }

  test("scrub stage redacts before downstream stages tokenize") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "good long text " * 20 + " reach me at a@b.co or https://x.y now"))
      .toDF("doc_id", "text")
    val out = DocPipeline(docs).scrub().df
      .select("text").collect().head.getString(0)
    assert(!out.contains("a@b.co") && !out.contains("https://"))
    assert(out.contains("<EMAIL>") && out.contains("<URL>"))
  }

  test("scrub participates in downstream dedup (stage order matters)") {
    import spark.implicits._
    // two docs identical except for redacted PII → duplicates AFTER scrub
    val base = "a reasonably long shared body of text for the exact dedup stage"
    val docs = Seq(
      (1L, s"$base contact a@b.co"),
      (2L, s"$base contact c@d.co")).toDF("doc_id", "text")
    val kept = DocPipeline(docs).scrub().exactDedup().df
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L), "scrubbed-identical docs must collapse to the min doc_id")
  }

  test("sql surface: graft_theta_sketch and graft_kmv_sample are callable") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 30L))
      .toDF("h", "v").createOrReplaceTempView("tsk")
    val arr = spark.sql("SELECT graft_theta_sketch(h, 2) AS mk FROM tsk")
      .collect().head.getSeq[Long](0)
    assert(arr === Seq(1L, 2L)) // min-2 distinct hashes
    val smp = spark.sql("SELECT graft_kmv_sample(h, v, 2) AS mk FROM tsk")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(smp === Seq((1L, 10L), (2L, 20L)))
  }

  test("model gates: lexiconGate/importanceWeight equal the standalone scorers") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val lex = graft.operators.QualityModels.lexiconTrain(spark, sf).localCheckpoint()
    val buckets = graft.operators.QualityModels.dsirBucketTable(spark, sf).localCheckpoint()
    val got = DocPipeline(docs).lexiconGate(lex).importanceWeight(buckets).df
      .select("doc_id", "importance").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val pred1 = graft.operators.QualityModels.lexiconScore(spark, sf)
      .filter(col("pred") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val want = graft.operators.QualityModels.dsirWeights(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .filter(t => pred1(t._1)).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
