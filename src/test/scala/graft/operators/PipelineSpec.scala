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

  test("trainingMix equals composing its stage operators independently") {
    import graft.functions.Hashing.h64
    val decon = Curation.decontaminated(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keepers = graft.Tables.documents(spark, sf)
      .withColumn("digest", h64(DocDedup.normalized(col("text"))))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scored = QualityModels.lexiconScore(spark, sf)
      .filter(col("pred") === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val imp = QualityModels.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val surv = decon.keySet.intersect(keepers)
      .intersect(scored.keySet).intersect(imp.keySet).toSeq.sorted
    var off = 0L
    val expected = surv.map { id =>
      val (nToks, score) = scored(id)
      val row = (id, decon(id), nToks, score, imp(id), off,
        off / Pipeline.PackSeqLen)
      off += nToks
      row
    }
    val got = Pipeline.trainingMix(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mixRetention reconciles raw counts with the trainingMix survivors") {
    val raw = graft.Tables.documents(spark, sf)
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val kept = Pipeline.trainingMix(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val expected = raw.toSeq.sortBy(_._1).map { case (s, (di, ti)) =>
      val (dk, tk) = kept.getOrElse(s, (0L, 0L))
      (s, di, ti, dk, tk, ratio4Model(dk, di), ratio4Model(tk, ti))
    }
    val got = Pipeline.mixRetention(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got == expected)
    // the gate stack must actually discriminate: not everything survives
    assert(got.map(_._4).sum < got.map(_._2).sum)
  }

  test("packBpeSequences cuts on the encoded per-doc BPE token totals") {
    import spark.implicits._
    val perDocWord = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val vocab = perDocWord.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toSeq.toDF("w", "n")
    val nsyms = Curation.bpeEncodedSymbols(vocab,
        Curation.bpeTrainMergesLocal(vocab, Curation.BpeRounds))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perDoc = perDocWord.groupBy(_._1).view
      .mapValues(_.map(t => t._3 * nsyms(t._2)).sum).toSeq.sortBy(_._1)
    val L = Pipeline.PackSeqLen
    var off = 0L
    val expected = perDoc.map { case (id, n) =>
      val row = (id, n, off, off / L,
        n > 0 && (off + n - 1) / L != off / L)
      off += n
      row
    }
    val got = Pipeline.packBpeSequences(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got == expected)
    // BPE totals differ from whitespace totals (it's a different unit)
    val ws = Pipeline.packSequences(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (id, n, _, _, _) => ws.get(id).exists(_ != n) })
  }

  test("packCurve reconciles with packSequences at each candidate length") {
    import org.apache.spark.sql.functions._
    val perDoc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = perDoc.map(_._2).sum
    val curve = Pipeline.packCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(curve.keySet == Pipeline.PackLens.toSet)
    Pipeline.PackLens.foreach { l =>
      // straddle count from first principles on the running offsets
      var off = 0L
      var straddle = 0L
      perDoc.foreach { case (_, n) =>
        if (n > 0 && (off + n - 1) / l != off / l) straddle += 1
        off += n
      }
      val (nDocs, totalToks, nPacks, nStraddle) = curve(l)
      assert(nDocs == perDoc.length.toLong)
      assert(totalToks == total)
      assert(nPacks == (total + l - 1) / l)
      assert(nStraddle == straddle)
    }
    // the 512 row must agree with the registered pack_sequences output
    val fromPack = Pipeline.packSequences(spark, sf).filter(col("straddles"))
      .count()
    assert(curve(Pipeline.PackSeqLen)._4 == fromPack)
  }

  test("tokenBudget selects the greedy quality-ordered prefix") {
    val B = 2000L
    val got = Pipeline.tokenBudget(spark, sf, budget = B).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // model: sort (q_key desc, doc_id), exclusive running token sum
    val byQuality = got.map(t => (t._1, t._2, t._3))
      .sortBy { case (id, qk, _) => (-qk, id) }
    var off = 0L
    val model = byQuality.map { case (id, qk, n) =>
      val row = (id, qk, n, off, off < B); off += n; row
    }.sortBy(_._1)
    assert(got == model)
    // the selected set is a non-empty proper prefix in quality order and
    // stops within one doc of the budget
    val sel = got.filter(_._5)
    assert(sel.nonEmpty && sel.size < got.size)
    val selTok = sel.map(_._3).sum
    val lastSel = byQuality.takeWhile(t => model.find(_._1 == t._1).get._5).last
    assert(selTok >= B || sel.size == got.size)
    assert(selTok - lastSel._3 < B)
    // q_key matches the shared quality-key spelling
    val qk = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextAnalysis.qualityKeyFromText(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, k, _, _, _) => assert(qk(id) == k) }
  }

  test("holdoutSplit is a disjoint total cover with stable hash assignment") {
    import graft.functions.Hashing.h64
    val panel = Pipeline.holdoutSplit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(panel.keySet == Set("train", "val", "test"))

    // model: per-doc bucket from the same salted hash
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"),
        pmod(h64(concat(lit("split:"), col("doc_id").cast("string"))),
          lit(Pipeline.SplitBuckets.toLong)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def nameOf(b: Long) =
      if (b == Pipeline.ValBucket) "val"
      else if (b == Pipeline.TestBucket) "test" else "train"
    val model = docs.groupBy(t => nameOf(t._3))
      .map { case (s, g) => s -> (g.length.toLong, g.map(_._2).sum) }
    // splits partition the corpus exactly: counts agree and sum to the total
    model.foreach { case (s, (nd, nt)) =>
      assert(panel(s)._1 == nd && panel(s)._2 == nt)
    }
    assert(panel.values.map(_._1).sum == docs.length.toLong)
    // shares are the exact ratio4 of the realized counts (sum ≈ 1)
    val (td, tt) = (docs.length.toLong, docs.map(_._2).sum)
    model.foreach { case (s, (nd, nt)) =>
      assert(panel(s)._3 == ratio4Model(nd, td))
      assert(panel(s)._4 == ratio4Model(nt, tt))
    }
    // train is the majority class at an 80/10/10 design
    assert(panel("train")._1 > panel("val")._1 &&
      panel("train")._1 > panel("test")._1)
  }

  test("splitLeakageOf counts a planted cross-split passage copy exactly") {
    import spark.implicits._
    val w = DocDedup.ChunkTokens
    val a = (1 to 12).map(i => s"a$i")
    val corpus = Seq(
      // train doc holding the source passage (5 windows, none counted)
      (1L, "train", a.mkString(" ")),
      // test doc copying train tokens a3..a10 after a 2-token prefix:
      // 10 tokens → 3 windows, exactly the last one (a3..a10) leaked
      (2L, "test", ("z1 z2 " + a.slice(2, 10).mkString(" "))),
      // val doc of fresh tokens: 2 windows, zero leaked
      (3L, "val", (1 to 9).map(i => s"b$i").mkString(" ")),
      // short test doc (< w tokens): contributes no windows at all
      (4L, "test", "q1 q2 q3"))
      .toDF("doc_id", "split", "text")
    val got = Pipeline.splitLeakageOf(corpus, w).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("test", "val"))
    val t = got("test")
    assert(t.getLong(1) == 1L && t.getLong(2) == 1L)       // docs, leaky docs
    assert(t.getLong(3) == 3L && t.getLong(4) == 1L)       // windows, leaked
    assert(t.getDouble(5) == ratio4Model(1, 3))            // leak_share
    assert(t.getDouble(6) == 1.0)                          // doc_leak_share
    val v = got("val")
    assert(v.getLong(1) == 1L && v.getLong(2) == 0L)
    assert(v.getLong(3) == 2L && v.getLong(4) == 0L)
    assert(v.getDouble(5) == 0.0 && v.getDouble(6) == 0.0)
  }

  test("splitLeakage panel is internally consistent at sf0.001") {
    val rows = Pipeline.splitLeakage(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("test", "val"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))   // leaky docs ⊆ docs
      assert(r.getLong(4) <= r.getLong(3))   // leaked ⊆ windows
      assert(r.getDouble(5) == ratio4Model(r.getLong(4), r.getLong(3)))
      assert(r.getDouble(6) == ratio4Model(r.getLong(2), r.getLong(1)))
    }
  }

  test("gateAblation: overlap rows complete the inclusion-exclusion algebra") {
    val rows = Pipeline.gateAblation(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("decontam", "exact_dedup", "lexicon",
      "overlap:decontam*exact_dedup", "overlap:decontam*lexicon",
      "overlap:exact_dedup*lexicon", "stack"))
    val base = rows("stack")._1 + rows("stack")._3 // kept + lost = |p|
    def keptDocs(g: String) = rows(g)._1
    // each pair's joint-kept ≤ either solo-kept; dropped-by-both =
    // p − a − b + a∩b must be the emitted loss column and nonnegative
    def check(pair: String, a: String, b: String): Unit = {
      val (kc, _, lc, _) = rows(pair)
      assert(kc <= math.min(keptDocs(a), keptDocs(b)))
      assert(lc === base - keptDocs(a) - keptDocs(b) + kc)
      assert(lc >= 0L)
      // dropped-by-both ≤ either gate's total drop
      assert(lc <= math.min(base - keptDocs(a), base - keptDocs(b)))
    }
    check("overlap:decontam*exact_dedup", "decontam", "exact_dedup")
    check("overlap:decontam*lexicon", "decontam", "lexicon")
    check("overlap:exact_dedup*lexicon", "exact_dedup", "lexicon")
    // marginal ≤ the gate's full drop; stack kept ≤ every pair's kept
    Seq("decontam", "exact_dedup", "lexicon").foreach { g =>
      assert(rows(g)._3 <= base - keptDocs(g))
    }
  }

  test("groupFolds: component-unit assignment, zero cross-fold pairs, exact cover") {
    def h64Model(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val comp = MinHashLSH.nearDupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docIds = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val gid = docIds.map(d => d -> comp.getOrElse(d, d)).toMap
    def fold(g: Long): Long = h64Model(s"fold:$g") % Pipeline.NumFolds
    val expected = docIds.groupBy(d => fold(gid(d))).toSeq.map { case (f, ds) =>
      (f, ds.size.toLong, ds.map(gid).distinct.size.toLong,
        ratio4Model(ds.size.toLong, docIds.size.toLong), 0L)
    }.sortBy(_._1)
    val got = Pipeline.groupFolds(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got == expected)
    // the released guarantee: no verified pair straddles folds, ever
    assert(got.forall(_._5 == 0L))
    // exact cover: fold doc counts sum to the corpus
    assert(got.map(_._2).sum == docIds.size.toLong)
    // every pair endpoint shares its partner's fold (the model's own check)
    MinHashLSH.nearDupPairs(spark, sf).select("d1", "d2").collect()
      .foreach(r => assert(fold(gid(r.getLong(0))) == fold(gid(r.getLong(1)))))
  }
}
