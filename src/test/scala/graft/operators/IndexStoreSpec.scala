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

  test("saved sq8 search equals the in-session build") {
    val got = rows(Similarity.searchSavedSq(spark, sf, indexDir))
    val want = rows(Similarity.sqTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("saved lsh search equals the in-session build") {
    val got = rows(Similarity.searchSavedLsh(spark, sf, indexDir))
    val want = rows(Similarity.lshTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("saved graph search equals the in-session build") {
    val d = Files.createTempDirectory("graft-graphidx").toString
    Similarity.saveGraphIndex(spark, sf, d)
    val got = rows(Similarity.searchSavedGraph(spark, sf, d))
    val want = rows(Similarity.graphTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("graph generations: latest committed wins, torn rebuild invisible") {
    val d = Files.createTempDirectory("graft-graphgen").toString
    assert(Similarity.latestGraphGen(spark, d).isEmpty)
    assert(Similarity.saveGraphIndexGen(spark, sf, d) == 0L)
    assert(Similarity.latestGraphGen(spark, d).contains(0L))
    val want = rows(Similarity.searchSavedGraph(spark, sf, d))
    assert(want == rows(Similarity.graphTopK(spark, sf)))
    // torn rebuild: data for gen 1 lands, the marker never does —
    // the search must keep serving gen 0
    spark.read.parquet(s"$d/graph_edges_gen=0").limit(10)
      .write.parquet(s"$d/graph_edges_gen=1")
    assert(Similarity.latestGraphGen(spark, d).contains(0L))
    assert(rows(Similarity.searchSavedGraph(spark, sf, d)) == want)
    // a committed rebuild takes over
    assert(Similarity.saveGraphIndexGen(spark, sf, d) == 1L)
    assert(Similarity.latestGraphGen(spark, d).contains(1L))
    assert(rows(Similarity.searchSavedGraph(spark, sf, d)) == want)
  }

  test("append path: build-half + append-half covers the corpus and is batch-order invariant") {
    import org.apache.spark.sql.functions._
    val full = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("e"))
    val halfA = full.filter(col("vec_id") % 2 === 0)
    val halfB = full.filter(col("vec_id") % 2 =!= 0)
    val dirA = Files.createTempDirectory("graft-annidx-a").toString
    Similarity.saveIndexOf(halfA, dirA)
    Similarity.appendToIndex(spark, dirA, halfB)
    // every vector indexed exactly once after the append
    val members = spark.read.parquet(s"$dirA/members")
    assert(members.count() == full.count())
    assert(members.select("vec_id").distinct().count() == full.count())
    assert(spark.read.parquet(s"$dirA/codes").count() == full.count())
    // appending in two sub-batches must yield identical searches
    val dirB = Files.createTempDirectory("graft-annidx-b").toString
    Similarity.saveIndexOf(halfA, dirB)
    Similarity.appendToIndex(spark, dirB, halfB.filter(col("vec_id") % 4 === 1))
    Similarity.appendToIndex(spark, dirB, halfB.filter(col("vec_id") % 4 === 3))
    assert(rows(Similarity.searchSavedIvfKmeans(spark, sf, dirA)) ==
      rows(Similarity.searchSavedIvfKmeans(spark, sf, dirB)))
    assert(rows(Similarity.searchSavedIvfPq(spark, sf, dirA)) ==
      rows(Similarity.searchSavedIvfPq(spark, sf, dirB)))
    assert(spark.read.parquet(s"$dirA/sqcodes").count() == full.count())
    assert(rows(Similarity.searchSavedSq(spark, sf, dirA)) ==
      rows(Similarity.searchSavedSq(spark, sf, dirB)))
    // LSH buckets have NO trained model (deterministic planes), so the
    // appended index must reproduce the full-corpus search EXACTLY
    assert(rows(Similarity.searchSavedLsh(spark, sf, dirA)) ==
      rows(Similarity.lshTopK(spark, sf)))
  }

  test("saved whitened search equals the in-session build (full-corpus W)") {
    val got = rows(Similarity.searchSavedWhitened(spark, sf, indexDir))
    val want = rows(Similarity.whitenedLshTopK(spark, sf))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("whitened append uses the FROZEN build-half transform") {
    import org.apache.spark.sql.functions._
    val full = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("e"))
    val halfA = full.filter(col("vec_id") % 2 === 0)
    val halfB = full.filter(col("vec_id") % 2 =!= 0)
    val d = Files.createTempDirectory("graft-annidx-w").toString
    Similarity.saveIndexOf(halfA, d)
    Similarity.appendToIndex(spark, d, halfB)
    // invariant: build-half save + append == bucketing the FULL corpus
    // under the half-trained frozen (μ, W) — NOT a re-trained full W
    val (mu, wm) = Spectral.whitenParamsOf(halfA)
    val ppb = Similarity.planesPerBandFor(halfA.count())
    val want = Similarity.whitenedBucketsOf(full, mu.toSeq,
        wm.map(_.toSeq).toSeq, Similarity.NumBands * ppb, ppb)
      .filter(col("band") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = spark.read.parquet(s"$d/wb0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == want)
    // and it DIFFERS from a full-corpus-trained W (the freeze is real)
    val (muF, wmF) = Spectral.whitenParamsOf(full)
    assert(muF.toSeq != mu.toSeq || wmF.map(_.toSeq).toSeq != wm.map(_.toSeq).toSeq)
  }

  test("appended-index recall floor: half-trained quantizers still serve the full corpus") {
    // The drift panel (ann_appended_recall): quantizers frozen at the
    // half-corpus build, other half appended, recall@5 vs full brute.
    // Floors pin the panel's health on the test corpus (measured 0.85 /
    // 0.15 — single-bucket LSH is intentionally the low-recall
    // cheap path; its job here is detecting CHANGE, so the spec also
    // pins determinism across runs).
    val r1 = Similarity.appendedRecall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1("saved_ivf_kmeans") >= 0.7,
      s"half-trained IVF recall collapsed: ${r1("saved_ivf_kmeans")}")
    assert(r1("saved_lsh") >= 0.1,
      s"frozen-plane LSH recall collapsed: ${r1("saved_lsh")}")
    // SQ8 under a frozen half-corpus [mn,mx]: out-of-range appendees
    // clamp, but cosine ranking stays near-lossless
    assert(r1("saved_sq") >= 0.9,
      s"frozen-range SQ8 recall collapsed: ${r1("saved_sq")}")
    val r2 = Similarity.appendedRecall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1 == r2, "appended-recall panel must be deterministic")
  }

  test("delete recall: tombstoned ids never served; surviving recall holds") {
    val rows = Similarity.deleteRecall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq ==
      Seq("saved_ivf_kmeans", "saved_lsh", "saved_sq"))
    // the erasure contract: a deleted vector served from any saved
    // artifact is the bug this panel exists to catch
    assert(rows.forall(_._3 == 0L), s"deleted ids served: $rows")
    // recall floors over the SURVIVING corpus (quantizers were trained
    // with the deleted vectors — model-level dependence would show up
    // here): measured 0.6375/1.0/0.1875 (ivf/sq/lsh) at sf0.001 —
    // nprobe=2 over 8 cells is coarse on a 100-vector corpus; at
    // sf0.1 ivf is 1.0. Floors pin what is true, not what was hoped.
    val byName = rows.map(r => r._1 -> r._4).toMap
    assert(byName("saved_ivf_kmeans") >= 0.5, byName.toString)
    assert(byName("saved_sq") >= 0.8, byName.toString)
    assert(byName("saved_lsh") >= 0.0 && rows.forall(_._4 <= 1.0))
    // deterministic (whole-panel memo: second call is the same frame)
    val again = Similarity.deleteRecall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == again.toSeq)
  }
}
