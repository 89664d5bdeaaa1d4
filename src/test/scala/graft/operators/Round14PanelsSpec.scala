package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 panels vs independent in-memory models at sf0.001:
  * the MinHash tuning sweep, the SN / phash funnels, the generic
  * prefix join over non-shingle set columns, and the fp-set join.
  */
class Round14PanelsSpec extends SparkSpec {

  test("minhashTuning: every grid row reconciles with its own end-to-end pass") {
    val grid = MinHashLSH.TuningGrid
    val got = MinHashLSH.minhashTuning(spark, sf).collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) ==
      grid.map { case (k, r) => (k.toLong, r.toLong) }
        .sortBy(identity))
    val nExact = DocDedup.prefixJoin(spark, sf).count()
    got.foreach { r =>
      val (k, br) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(r.getLong(2) == (k / br).toLong) // n_bands
      assert(r.getLong(5) == nExact)          // shared exact side
      // verified LSH pairs are a subset of exact (uncapped-set verify)
      assert(r.getLong(4) <= r.getLong(3))    // n_pairs <= n_candidates
      assert(r.getLong(4) <= nExact)
      assert(r.getLong(8) <= r.getLong(7))    // caught_lo <= exact_lo
      assert(r.getDouble(6) ==
        ratio4Model(r.getLong(4), math.max(nExact, 1L)))
    }
    // the shipped default is a grid member and its row recalls the
    // registry's own recall report
    val defRow = got.find(r =>
      r.getLong(0) == MinHashLSH.NumSeeds.toLong &&
        r.getLong(1) == MinHashLSH.BandRows.toLong).get
    val rec = MinHashLSH.minhashRecall(spark, sf).collect().head
    assert(defRow.getLong(4) == rec.getLong(1)) // n_pairs == n_lsh
    assert(defRow.getDouble(6) == rec.getDouble(4))
  }

  test("snFunnel: counts reconcile with the SN operator's own frames") {
    val row = Blocking.snFunnel(spark, sf).collect().head
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(row.getLong(0) == nDocs)
    assert(row.getLong(1) == nDocs * (Blocking.SnWindow - 1))
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val cand = Blocking.snCandidatesOf(docs).count()
    val acc = Blocking.sortedNeighborhood(spark, sf).count()
    assert(row.getLong(2) == cand)
    assert(row.getLong(3) == acc)
    // candidates are probes whose partner rank exists: the last w−1
    // ranks lose 1..w−1 partners respectively
    val w = Blocking.SnWindow
    assert(cand == nDocs * (w - 1) - (w - 1).toLong * w / 2)
    assert(row.getDouble(4) ==
      ratio4Model(acc, math.max(cand, 1L)))
  }

  test("phashFunnel: counts reconcile with the phash operator and the band math") {
    val row = Multimodal.phashFunnel(spark, sf).collect().head
    val pairs = Multimodal.nearDupPairs(spark, sf).count()
    assert(row.getLong(3) == pairs) // n_pairs == released operator rows
    // every asset contributes ≤ 8 banded rows (cap only removes)
    assert(row.getLong(1) <= row.getLong(0) * SimHash.Bands)
    assert(row.getLong(3) <= row.getLong(2)) // accepted ⊆ candidates
    assert(row.getDouble(4) ==
      ratio4Model(row.getLong(3), math.max(row.getLong(2), 1L)))
  }

  test("prefixJoinOf is generic: exact tau-Jaccard join over long-typed tag sets") {
    import spark.implicits._
    // a non-shingle set column: synthetic LongType tag sets
    val sets: Map[Long, Set[Long]] = Map(
      1L -> Set(10L, 11L, 12L, 13L),       // near-dup of 2
      2L -> Set(10L, 11L, 12L, 14L),       // j(1,2)=3/5=0.6
      3L -> Set(10L, 11L),                 // j(1,3)=2/4=0.5 boundary
      4L -> Set(20L, 21L, 22L),            // disjoint cluster
      5L -> Set(20L, 21L, 22L),            // j(4,5)=1
      6L -> Set(30L),                      // singleton
      7L -> Set(10L, 20L, 30L, 40L, 50L))  // low sim to all
    val sh = sets.toSeq.flatMap { case (d, s) => s.map(e => (d, e)) }
      .toDF("doc_id", "shingle")
    val got = DocDedup.prefixJoinOf(sh).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size.toLong
      if inter > 0
      uni = sets(i).size + sets(j).size - inter
      jac = inter.toDouble / uni
      if jac >= 0.5
    } yield (i, j, inter, uni, jac)).sortBy(r => (r._1, r._2))
    assert(got == expected)
    // the boundary pair (1,3) at exactly 0.5 is IN (>= contract)
    assert(got.exists(r => r._1 == 1L && r._2 == 3L))
  }

  test("prefixJoinOf under heavy exact replication: class contraction is exact") {
    import spark.implicits._
    // the scale_up stress pathology: every set appears K times under
    // distinct doc ids — identical prefixes AND identical full sets, so
    // both contraction maps (candidate classes, verify set classes) are
    // exercised with multi-member classes; the expansion must reproduce
    // the brute-force doc-grain join exactly (within-replica pairs at
    // jaccard 1, cross pairs once each, orientation d1 < d2)
    val base: Map[Long, Set[Long]] = Map(
      1L -> Set(10L, 11L, 12L, 13L),
      2L -> Set(10L, 11L, 12L, 14L),
      3L -> Set(10L, 11L),
      4L -> Set(20L, 21L, 22L),
      6L -> Set(30L))
    val k = 3
    val sets: Map[Long, Set[Long]] =
      (0 until k).flatMap(i => base.map { case (d, s) => (d + i * 100L, s) }).toMap
    val sh = sets.toSeq.flatMap { case (d, s) => s.map(e => (d, e)) }
      .toDF("doc_id", "shingle")
    val got = DocDedup.prefixJoinOf(sh).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size.toLong
      if inter > 0
      uni = sets(i).size + sets(j).size - inter
      jac = inter.toDouble / uni
      if jac >= 0.5
    } yield (i, j, inter, uni, jac)).sortBy(r => (r._1, r._2))
    assert(got == expected)
    // every replica family contributes its C(k,2) identical pairs
    assert(got.count(_._5 == 1.0) >= base.size * k * (k - 1) / 2)
  }

  test("splitNearDupLeakage: spine complete, sizes and pair counts reconcile") {
    val got = Pipeline.splitNearDupLeakage(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // the 6-row unordered spine is corpus-independent
    assert(got.map(t => (t._1, t._2)) == Seq(
      ("test", "test"), ("test", "train"), ("test", "val"),
      ("train", "train"), ("train", "val"), ("val", "val")))
    // independent labeling: holdoutSplit's own sizes, pairs re-labeled
    val sizes = Pipeline.holdoutSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { t =>
      assert(t._3 == sizes.getOrElse(t._1, 0L))
      assert(t._4 == sizes.getOrElse(t._2, 0L))
    }
    // total pairs across cells == the released pair set
    assert(got.map(_._5).sum == MinHashLSH.nearDupPairs(spark, sf).count())
  }

  test("fpSetJoin: exactly the brute-force tau-Jaccard pairs over fingerprint sets") {
    val fp = DocDedup.winnowFingerprintsOf(
        graft.Tables.documents(spark, sf).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = byDoc.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = (byDoc(i) & byDoc(j)).size.toLong
      if inter > 0
      uni = byDoc(i).size + byDoc(j).size - inter
      jac = inter.toDouble / uni
      if jac >= 0.5
    } yield (i, j, inter, uni, jac)).sortBy(r => (r._1, r._2))
    val got = Linkage.fpSetJoin(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
