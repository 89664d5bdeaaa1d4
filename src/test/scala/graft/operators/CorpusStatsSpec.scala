package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusStats vs independent in-memory models at sf0.001 (the DuckDB
  * oracle proves the same semantics cross-engine at sf0.01/0.001 via
  * the driver; these pin them inside the JVM). */
class CorpusStatsSpec extends SparkSpec {

  private lazy val docTokens: Map[Long, Seq[String]] =
    graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap

  test("zipfTerms matches a naive tf/df model with deterministic ranks") {
    val tf = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val df = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docTokens.foreach { case (_, toks) =>
      toks.foreach(t => tf(t) += 1)
      toks.distinct.foreach(t => df(t) += 1)
    }
    val expected = tf.toSeq.map { case (t, f) => (t, f, df(t)) }
      .sortBy { case (t, f, _) => (-f, t) }.take(50)
      .zipWithIndex.map { case ((t, f, d), i) => ((i + 1).toLong, t, f, d) }
    val got = CorpusStats.zipfTerms(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got == expected)
  }

  test("shingleDfProfile matches a distinct-shingle df histogram model") {
    val df = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docTokens.foreach { case (_, toks) =>
      if (toks.size >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.foreach(s => df(s) += 1)
    }
    val expected = df.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sorted
    val got = CorpusStats.shingleDfProfile(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == expected)
  }

  test("bigramCoverage matches a top-100 coverage model") {
    val perDoc = docTokens.view.mapValues(toks =>
      if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty)
      .toMap
    val corpus = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    perDoc.values.foreach(_.foreach(p => corpus(p) += 1))
    val head = corpus.toSeq.sortBy { case (p, n) => (-n, p) }.take(100).map(_._1).toSet
    val expected = perDoc.collect { case (id, bgs) if bgs.nonEmpty =>
      val covered = bgs.count(head).toLong
      (id, bgs.size.toLong, covered, ratio4Model(covered, bgs.size.toLong))
    }.toSeq.sortBy(_._1)
    val got = CorpusStats.bigramCoverage(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
  }

  test("clusterSizes is the size histogram of nearDupComponents") {
    val comps = MinHashLSH.nearDupComponents(spark, sf).collect()
      .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length.toLong)
    val expected = comps.values.toSeq.groupBy(identity).view
      .map { case (sz, g) => (sz, g.size.toLong, sz * g.size) }
      .toSeq.sortBy(_._1)
    val got = CorpusStats.clusterSizes(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // the corpus actually exercises multi-size histograms
    assert(got.nonEmpty && got.map(_._1).exists(_ >= 2))
  }

  test("heapsCurve matches a first-occurrence vocabulary growth model") {
    val m = docTokens.keys.max
    def bucket(id: Long): Long = id * 10 / (m + 1)
    val toksPerBucket = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docTokens.toSeq.sortBy(_._1).foreach { case (id, toks) =>
      toksPerBucket(bucket(id)) += toks.size
      toks.foreach(t => if (!firstDoc.contains(t) || firstDoc(t) > id) firstDoc(t) = id)
    }
    val newPerBucket = firstDoc.values.groupBy(bucket).view.mapValues(_.size.toLong)
    var (ct, cy) = (0L, 0L)
    val expected = toksPerBucket.toSeq.sorted.map { case (b, n) =>
      val nt = newPerBucket.getOrElse(b, 0L)
      ct += n; cy += nt
      (b, n, ct, nt, cy)
    }
    val got = CorpusStats.heapsCurve(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got == expected)
    // Heaps: later buckets introduce fewer new types than the first
    assert(got.last._4 < got.head._4)
  }

  private def hu(a: Long, b: Long): Long = (a + b / 2) / b

  test("heavyHitters is exact: count·threshold > total, sketch-assisted") {
    val all = docTokens.values.flatten.toSeq
    val total = all.size.toLong
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq
      .filter { case (_, n) => n * CorpusStats.HhThreshold > total }
      .map { case (t, n) =>
        (t, n, hu(n * 10000L, total) / 10000.0) }
      .sortBy { case (t, n, _) => (-n, t) }
    val got = CorpusStats.heavyHitters(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mgSketch keeps every term above the n/(k+1) guarantee, merged") {
    val k = 8
    val terms = graft.Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .repartition(16) // force many partial buffers through merge()
    val sk = terms.agg(graft.plans.MisraGries.mgSketch(col("term"), k))
      .collect()(0).getMap[String, Long](0)
    assert(sk.size <= k)
    val all = docTokens.values.flatten.toSeq
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong)
    val guaranteed = counts.filter(_._2 > all.size.toLong / (k + 1)).keySet
    assert(guaranteed.subsetOf(sk.keySet.toSet))
    // estimates never exceed true counts
    sk.foreach { case (t, est) => assert(est <= counts(t)) }
  }

  test("lengthSurvival matches the conditional-sum model at every cutoff") {
    val lens = docTokens.values.map(_.size.toLong).toSeq
    val expected = (0 to 10).map { i =>
      val x = 1L << i
      (x, lens.count(_ >= x).toLong, lens.filter(_ >= x).sum)
    }
    val got = CorpusStats.lengthSurvival(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // the curve is monotone non-increasing in both docs and mass
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3)
    }
  }

  test("oovRate scores against the deterministic top-N vocabulary") {
    // vocab smaller than the corpus's distinct-term count so OOV mass
    // actually exists at sf0.001 (the default 200 swallows it whole)
    val V = 20
    val bySource = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val tf = bySource.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val vocab = tf.sortBy { case (t, f) => (-f, t) }.take(V).map(_._1).toSet
    val expected = bySource.groupBy(_._1).toSeq.map { case (s, docs) =>
      val occ = docs.flatMap(_._2)
      val oov = occ.count(t => !vocab.contains(t)).toLong
      (s, occ.size.toLong, oov,
        hu(oov * 10000L, occ.size.toLong) / 10000.0)
    }.sortBy(_._1)
    val got = CorpusStats.oovRate(spark, sf, vocabSize = V).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // some source actually has OOV mass at this vocab size
    assert(got.exists(_._3 > 0L))
  }

  test("pmiPairs matches the two-step integer-lift collocation model") {
    val toks = docTokens.values.toSeq
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.map(_.size.toLong).sum
    val c12 = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val model = c12.toSeq
      .filter(_._2 >= CorpusStats.PmiMinPair)
      .map { case ((w1, w2), c) =>
        val p214 = hu(c * 10000L, uni(w1))
        (w1, w2, c, uni(w1), uni(w2), p214, hu(p214 * n, uni(w2)))
      }
      .sortBy { case (w1, w2, _, _, _, _, l) => (-l, w1, w2) }
      .take(CorpusStats.PmiHead)
    val got = CorpusStats.pmiPairs(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == model)
    // the head is a real association panel: every lift beats neutral (1.0)
    assert(got.nonEmpty && got.forall(_._7 > 10000L))
  }

  test("boilerplatePrefix surfaces shared-opening families, gated at 3 docs") {
    val docsSrc = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pre = docTokens.toSeq
      .filter(_._2.nonEmpty)
      .map { case (id, t) =>
        (id, docsSrc(id), t.take(CorpusStats.PrefixLen).mkString(" "))
      }
    val tot = pre.size.toLong
    val model = pre.groupBy(_._3).toSeq
      .map { case (p, g) =>
        (p, g.size.toLong, g.map(_._2).distinct.size.toLong, g.map(_._1).min)
      }
      .filter(_._2 >= CorpusStats.MinFamily)
      .map { case (p, n, s, ex) => (p, n, s, ex, ratio4Model(n, tot)) }
      .sortBy { case (p, n, _, _, _) => (-n, p) }
    val got = CorpusStats.boilerplatePrefix(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == model)
    // the planted duplicate families surface even at sf0.001
    assert(got.nonEmpty && got.forall(_._2 >= CorpusStats.MinFamily))
  }

  test("zipfCoverage matches a ranked cumulative model and saturates") {
    val tf = docTokens.values.toSeq.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    val tot = tf.map(_._2).sum
    val model = (0 to 10).map { i =>
      val k = 1L << i
      val head = tf.take(k.toInt)
      val mass = head.map(_._2).sum
      (k, head.size.toLong, mass, ratio4Model(mass, tot))
    }
    val got = CorpusStats.zipfCoverage(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == model)
    // monotone and saturating at the full corpus mass
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.last._3 == tot && got.last._4 == 1.0)
  }

  test("sourceOverlapOf matches a distinct-window set model on a planted overlap") {
    import spark.implicits._
    val w = DocDedup.ChunkTokens
    val x = (1 to 10).map(i => s"x$i")
    val corpus = Seq(
      (1L, "X", x.mkString(" ")),                              // 3 windows
      (2L, "Y", (x.take(8) :+ "y9" :+ "y10").mkString(" ")),   // 3 windows, 1 ∩ X
      (3L, "Z", (1 to 8).map(i => s"z$i").mkString(" ")))      // 1 window, disjoint
      .toDF("doc_id", "source", "text")
    // in-memory distinct-window sets — the semantics, independent of hashing
    val sets = Map(
      "X" -> x.sliding(w).map(_.mkString(" ")).toSet,
      "Y" -> (x.take(8) :+ "y9" :+ "y10").sliding(w).map(_.mkString(" ")).toSet,
      "Z" -> (1 to 8).map(i => s"z$i").sliding(w).map(_.mkString(" ")).toSet)
    val model = (for {
      s1 <- sets.keys; s2 <- sets.keys if s1 < s2
      shared = (sets(s1) & sets(s2)).size.toLong if shared > 0
      n1 = sets(s1).size.toLong; n2 = sets(s2).size.toLong
    } yield (s1, s2, n1, n2, shared,
      ratio4Model(shared, n1), ratio4Model(shared, n2),
      ratio4Model(shared, n1 + n2 - shared))).toSeq.sorted
    val got = CorpusStats.sourceOverlapOf(corpus, w).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got == model)
    // the planted shape: exactly the (X, Y) pair with one shared window
    assert(got == Seq(("X", "Y", 3L, 3L, 1L,
      ratio4Model(1, 3), ratio4Model(1, 3), ratio4Model(1, 5))))
  }

  test("sourceTemplateShare matches a local modal-prefix model per source") {
    val k = CorpusStats.PrefixLen
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val model = docs
      .map { case (s, t) => s -> t.trim.split("\\s+").filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
      .map { case (s, toks) => s -> toks.take(k).mkString(" ") }
      .groupBy(_._1).map { case (s, xs) =>
        val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        // top by (count desc, prefix asc) — the engine's tiebreak
        val (prefix, c) = counts.toSeq.minBy { case (p, n) => (-n, p) }
        s -> ((xs.size.toLong, prefix, c, ratio4Model(c, xs.size.toLong)))
      }
    val got = CorpusStats.sourceTemplateShare(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === model)
  }

  test("ingestNovelty matches the first-occurrence decile model") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val m = docs.map(_._1).max
    def decile(id: Long) = id * 10 / (m + 1)
    val shd = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (t.length < 3) Seq.empty
      else t.sliding(3).map(_.mkString(" ")).toSeq.distinct
        .map(s => (id, s, decile(id)))
    }
    val inst = shd.groupBy(_._3).map { case (d, g) =>
      d -> ((g.size.toLong, g.map(_._2).distinct.size.toLong)) }
    val fresh = shd.groupBy(_._2).map(_._2.map(_._3).min)
      .groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    val expected = docs.map(d => decile(d._1)).groupBy(identity)
      .map { case (d, g) =>
        val (ni, nd) = inst.getOrElse(d, (0L, 0L))
        val nn = fresh.getOrElse(d, 0L)
        (d, g.size.toLong, ni, nd, nn, ratio4Model(nn, math.max(nd, 1L)))
      }.toSeq.sortBy(_._1)
    val got = CorpusStats.ingestNovelty(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // novelty declines from the first decile to the last (the curve's point)
    assert(got.head._6 > got.last._6)
  }

  test("sourceOriginality matches the min-doc ownership model") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val shd = docs.flatMap { case (id, src, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (t.length < 3) Seq.empty
      else t.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(s => (id, src, s))
    }
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val dist = shd.groupBy(_._2).map { case (s, g) =>
      s -> g.map(_._3).distinct.size.toLong }
    val owned = shd.groupBy(_._3).map(_._2.map(_._1).min)
      .groupBy(srcOf).map { case (s, g) => s -> g.size.toLong }
    val expected = docs.groupBy(_._2).map { case (s, g) =>
      val nd = dist.getOrElse(s, 0L); val no = owned.getOrElse(s, 0L)
      (s, g.size.toLong, nd, no, ratio4Model(no, math.max(nd, 1L)))
    }.toSeq.sortBy(_._1)
    val got = CorpusStats.sourceOriginality(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == expected)
    // ownership partitions the distinct-shingle universe exactly
    assert(got.map(_._4).sum == shd.map(_._3).distinct.size.toLong)
  }
}
