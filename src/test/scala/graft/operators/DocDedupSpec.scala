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

  test("normalizationCurve: monotone ladder reconciling with direct distinct counts") {
    import org.apache.spark.sql.functions._
    val got = DocDedup.normalizationCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).toSeq == Seq("raw", "ws", "lower", "alnum"))
    // coarser equivalence can only merge classes: dup counts non-decreasing
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted)
    // the `lower` level is the engine's canonical normalized(): its
    // distinct count must equal an independent distinct over normalized
    val docs = graft.Tables.documents(spark, sf)
    val wantLower = docs.select(DocDedup.normalized(col("text"))).distinct().count()
    assert(got.find(_._2 == "lower").get._4 == wantLower)
    val wantRaw = docs.select("text").distinct().count()
    assert(got.find(_._2 == "raw").get._4 == wantRaw)
    assert(got.forall(_._3 == docs.count()))
  }

  test("ngramJaccard emits symmetric-free ordered pairs above tau") {
    val out = DocDedup.ngramJaccard(spark, sf, tau = 0.5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("passageDedup finds a planted copy at a non-grid offset that chunk dedup misses") {
    import spark.implicits._
    val w = DocDedup.ChunkTokens // 8
    // doc 1: 40 unique tokens; doc 2 embeds doc 1's tokens a5..a20
    // (L=16) at position 11 — NOT a multiple of the chunk width
    val a = (1 to 40).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val doc1 = a.mkString(" ")
    val doc2 = (b.take(10) ++ a.slice(4, 20) ++ b.drop(10)).mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    // the non-overlapping chunk grids provably share nothing (the miss)
    def grid(toks: Seq[String]) =
      toks.grouped(w).filter(_.size == w).map(_.mkString(" ")).toSet
    assert(grid(a).intersect(grid(b.take(10) ++ a.slice(4, 20) ++ b.drop(10))).isEmpty)
    // the rolling pass reports exactly the planted span in doc 2:
    // windows 11..19 duplicated -> one island of 9 windows, 16 tokens
    val got = DocDedup.passageDedupOf(docs, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((2L, 11L, 19L, 16L, 9L)))
  }

  test("dupNgramShare matches a global-first rolling-window model per source") {
    val w = DocDedup.ChunkTokens
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").filter(_.nonEmpty).toSeq))
    val wins = docs.filter(_._3.length >= w).flatMap { case (id, src, t) =>
      t.sliding(w).zipWithIndex.map { case (win, i) =>
        (id, src, i + 1L, win.mkString(" "))
      }
    }
    // global first occurrence per window content, by (doc_id, pos)
    val firsts = wins.groupBy(_._4).view
      .mapValues(_.map(t => (t._1, t._3)).min).toMap
    val model = wins.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, g) =>
      val dup = g.count(t => firsts(t._4) != ((t._1, t._3))).toLong
      (src, g.length.toLong, dup, ratio4Model(dup, g.length.toLong))
    }
    val got = DocDedup.dupNgramShare(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == model)
    // the planted duplicate docs put real duplicated mass somewhere
    assert(got.exists(_._3 > 0L))
  }

  test("passageBatch fold over doc-ordered batches equals the one-shot pass") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val w = DocDedup.ChunkTokens
    val oneShot = DocDedup.passageDedupOf(docs, w).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    var index = Seq.empty[(Long, Long, Long)]
      .toDF("win_h", "doc_id", "pos")
    val folded = all.grouped(math.max(1, all.length / 3)).flatMap { b =>
      val (spans, next) = DocDedup.passageBatch(index,
        b.toSeq.toDF("doc_id", "text"), w)
      // materialize BEFORE index reassignment (lazy plans chain otherwise)
      val out = spans.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      index = next.localCheckpoint(true)
      out
    }.toSeq
    assert(folded.sortBy(s => (s._1, s._2)) == oneShot.sortBy(s => (s._1, s._2)))
    // the final index holds exactly the distinct window hashes' firsts
    val wins = DocDedup.rollingWindowsOf(docs, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val firsts = wins.groupBy(_._3).view
      .mapValues(g => g.map(t => (t._1, t._2)).min).toMap
    val gotIdx = index.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotIdx == firsts)
  }

  test("multiSignalComponents = union-find over the union of all three signals' edges") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // exact edges: normalized-digest groups, min id keeps
    val exact = docs.groupBy { case (_, t) =>
        t.trim.replaceAll("\\s+", " ").toLowerCase }
      .values.filter(_.size > 1).toSeq
      .flatMap { g => val ids = g.map(_._1).sorted; ids.tail.map(ids.head -> _) }
    val lex = MinHashLSH.nearDupPairs(spark, sf, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sem = Similarity.nearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = (exact ++ lex ++ sem).distinct
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = MinHashLSH.multiSignalComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.map(_._1).toSet == nodes)
    got.foreach { case (id, comp, _, _, _) => assert(comp == find(id)) }
    // signal flags mark exactly the edge membership of each pass
    val (exN, lxN, smN) = (
      exact.flatMap(e => Seq(e._1, e._2)).toSet,
      lex.flatMap(e => Seq(e._1, e._2)).toSet,
      sem.flatMap(e => Seq(e._1, e._2)).toSet)
    got.foreach { case (id, _, fe, fl, fs) =>
      assert(fe == exN(id) && fl == lxN(id) && fs == smN(id))
    }
    // the union genuinely adds signal: some doc is semantic-only
    assert(got.exists { case (_, _, fe, fl, fs) => fs && !fe && !fl })
  }

  test("lshBucketProfile matches a driver model over the banded signatures") {
    import org.apache.spark.sql.functions.col
    val bands = MinHashLSH.bandSignatures(
        graft.Tables.documents(spark, sf).select("doc_id", "text"))
      .select(col("band").cast("long"), col("sig")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cap = MinHashLSH.MaxBucketSize
    val want = bands.groupBy(_._1).map { case (b, g) =>
      val sizes = g.groupBy(_._2).values.map(_.length.toLong).toSeq
      b -> (g.length.toLong, sizes.length.toLong, sizes.max,
        sizes.map(c => c * (c - 1) / 2).sum,
        sizes.count(_ > cap).toLong,
        sizes.filter(_ <= cap).map(c => c * (c - 1) / 2).sum)
    }
    val got = MinHashLSH.lshBucketProfile(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) === want(r.getLong(0)),
        s"band ${r.getLong(0)}")
      // capping never grows the pair mass
      assert(r.getLong(6) <= r.getLong(4))
    }
    // the profile upper-bounds the actual candidate join: distinct
    // candidate pairs ≤ the capped pair mass summed over bands
    val nCand = MinHashLSH.lshCandidates(
      graft.Tables.documents(spark, sf).select("doc_id", "text")).count()
    assert(nCand <= got.map(_.getLong(6)).sum)
  }

  test("shingleDfProfile matches a driver df-bucket model") {
    val sh = DocDedup.docShingles(spark, sf)
      .select("shingle").collect().map(_.getString(0))
    val cap = DocDedup.MaxShingleDf
    def rank(df: Long) =
      if (df == 1) 1L else if (df <= 4) 2L else if (df <= 9) 3L
      else if (df <= 19) 4L else if (df <= cap) 5L else 6L
    val want = sh.groupBy(identity).values.map(_.length.toLong).toSeq
      .groupBy(rank).view.mapValues { dfs =>
        (dfs.length.toLong, dfs.sum, dfs.map(d => d * (d - 1) / 2).sum)
      }.toMap
    val got = DocDedup.shingleDfProfile(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      assert((r.getLong(2), r.getLong(3), r.getLong(4))
        === want(r.getLong(0)), s"bucket ${r.getString(1)}")
      assert(r.getBoolean(5) === (r.getLong(0) == 6L))
    }
    // posting conservation: Σ posting_mass == total (doc, shingle) rows
    assert(got.map(_.getLong(3)).sum === sh.length.toLong)
  }

  test("pairAuditSample: per-band bottom-k by seeded hash, inside the pair set") {
    val pairs = MinHashLSH.nearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    def akey(d1: Long, d2: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"audit:$d1:$d2".getBytes("UTF-8"))
      // h64 = first 15 hex chars as int64 (60 bits) — mirror via bytes
      java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val want = pairs.groupBy(p => math.floor(p._3 * 20).toLong)
      .view.mapValues(_.sortBy(p => (akey(p._1, p._2), p._1, p._2)).take(5))
      .toMap
    val got = MinHashLSH.pairAuditSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (band, rows) =>
      val w = want(band)
      assert(rows.length === w.length, s"band $band size")
      rows.sortBy(_._2).zip(w).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g._2 === i + 1L, s"rank gap in band $band")
        assert((g._3, g._4, g._5) === e, s"band $band rank ${i + 1}")
      }
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

  test("CDC chunks resynchronize after an insertion (the anti-shift property)") {
    import spark.implicits._
    // 2 docs: b = a with ONE token inserted near the front. Fixed-width
    // chunking would shift every later chunk; content-defined
    // boundaries resync within a window, so most of b's chunks must be
    // byte-identical to a's and flagged duplicated.
    val a = (1 to 400).map(i => s"tok${i % 83}").mkString(" ")
    val b = ("INSERTED" +: a.split(" ").toSeq).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    Seq((0L, a, "en", "s", a.length.toLong), (1L, b, "en", "s", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DocDedup.cdcChunkDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nb, dupB) = out(1L)
    assert(nb >= 4, s"expected several chunks, got $nb")
    assert(dupB.toDouble / nb >= 0.5,
      s"only $dupB of $nb chunks deduplicated after a 1-token edit")
  }

  test("cdcChunkDedupOf matches a local model, including a 20k-token doc") {
    import spark.implicits._
    def h64m(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    val rnd = new scala.util.Random(7)
    val longDoc = (1 to 20000).map(_ => s"w${rnd.nextInt(211)}").mkString(" ")
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, longDoc),
      (2L, longDoc), // exact duplicate: every chunk of 2 must be a dup
      (3L, ""), // tokenless: absent from the manifest
      (4L, "x x x")) // shorter than the boundary window: one chunk
    val got = DocDedup.cdcChunkDedupOf(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // local model of the whole manifest
    val w = DocDedup.CdcWindow
    val m = DocDedup.CdcMod
    val chunksOf: Map[Long, Seq[Long]] = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) None
      else {
        val flags = toks.indices.map { i0 =>
          val pos = i0 + 1
          pos >= w && h64m(toks.slice(pos - w, pos).mkString(" ")) % m == 0
        }
        val idx = flags.scanLeft(0L)((a, f) => a + (if (f) 1L else 0L)).init
        Some(id -> toks.zip(idx).groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (_, g) => h64m(g.map(_._1).mkString(" ")) })
      }
    }.toMap
    val keeper = chunksOf.toSeq
      .flatMap { case (id, hs) => hs.zipWithIndex.map { case (h, i) => (h, (id, i.toLong)) } }
      .groupBy(_._1).map { case (h, g) => h -> g.map(_._2).min }
    assert(got.keySet === chunksOf.keySet)
    chunksOf.foreach { case (id, hs) =>
      val nDup = hs.zipWithIndex.count { case (h, i) => keeper(h) != ((id, i.toLong)) }
      assert(got(id) === ((hs.size.toLong, nDup.toLong,
        ratio4Model(nDup.toLong, hs.size.toLong))), s"doc $id")
    }
    assert(got(2L)._2 === got(2L)._1) // the exact-dup doc is fully duplicated
  }

  test("winnowingPairs: window-min fingerprints match the driver model") {
    def h64m(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val k = DocDedup.WinnowK; val w = DocDedup.WinnowW
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fps: Seq[(Long, Long)] = docs.toSeq.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < k) Nil
      else {
        val hs = (0 to toks.size - k)
          .map(i => h64m(toks.slice(i, i + k).mkString(" ")))
        val nWin = math.max(hs.size - w + 1, 1)
        (0 until nWin).map(j => id -> hs.slice(j, j + w).min).distinct
      }
    }.distinct
    val df = fps.groupBy(_._2).view.mapValues(_.size).toMap
    val capped = fps.filter(f => df(f._2) <= DocDedup.MaxFpDf)
    val byHash = capped.groupBy(_._2).values.toSeq
    val expected = byHash.flatMap { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; jj <- i + 1 until ids.size) yield (ids(i), ids(jj))
    }.groupBy(identity).map { case ((a, b), ps) => (a, b, ps.size.toLong) }
      .filter(_._3 >= DocDedup.MinSharedFp)
      .toSeq.sortBy(r => (r._1, r._2))
    val got = DocDedup.winnowingPairs(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // the corpus's planted near-dups are caught
    assert(got.nonEmpty)
    // selection really thins: fingerprints ≪ total k-gram positions
    val nPos = docs.map(d =>
      math.max(d._2.trim.split("\\s+").count(_.nonEmpty) - k + 1, 0)).sum
    assert(fps.size < nPos / 2)
  }

  test("winnowingAgreement row reconciles with the two pair sets it grades") {
    val mh = MinHashLSH.nearDupPairs(spark, sf).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wp = DocDedup.winnowingPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val common = mh.intersect(wp)
    val got = DocDedup.winnowingAgreement(spark, sf).collect().head
    assert(got.getLong(0) == mh.size.toLong)
    assert(got.getLong(1) == wp.size.toLong)
    assert(got.getLong(2) == common.size.toLong)
    assert(got.getDouble(3) ==
      ratio4Model(common.size.toLong, math.max(mh.size.toLong, 1L)))
    assert(got.getDouble(4) ==
      ratio4Model(common.size.toLong, math.max(wp.size.toLong, 1L)))
    // the two methods genuinely overlap on the planted near-dups
    assert(common.nonEmpty)
  }
  test("prefixJoin: EXACTLY the brute-force tau-Jaccard pair set over uncapped shingle sets") {
    val sets = DocDedup.docShingles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = sets(ids(i)); b = sets(ids(j))
      shared = (a & b).size
      if shared > 0
      union = a.size + b.size - shared
      jac = shared.toDouble / union
      if jac >= 0.5
    } yield (ids(i), ids(j), shared.toLong, union.toLong, jac))
      .sortBy(r => (r._1, r._2))
    val got = DocDedup.prefixJoin(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // exactness is the contract: no false negatives (unlike MinHash),
    // no df-cap truncation (unlike #8), no false positives
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("prefixJoinFunnel: counts reconcile with the shingle table and the pair list") {
    val row = DocDedup.prefixJoinFunnel(spark, sf).collect().head
    val (nDocs, nSh, nPref, nCand, nPairs) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    val sh = DocDedup.docShingles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(nDocs == sh.map(_._1).distinct.size.toLong)
    assert(nSh == sh.size.toLong)
    assert(nPairs == DocDedup.prefixJoin(spark, sf).count())
    // the funnel narrows: prefix ⊆ shingle rows, verified ⊆ candidates
    assert(nPref <= nSh && nPairs <= nCand)
    // τ = 0.5 prefixes index about half the rows (n − ⌈n/2⌉ + 1 per doc)
    assert(nPref * 10 >= nSh * 4 && nPref * 10 <= nSh * 6)
  }

}
