package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Curation tier vs independent in-memory models at sf0.001. */
class CurationSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  private lazy val docs: Seq[(Long, String, String)] =
    graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  test("contamination matches a brute-force n-gram overlap model") {
    val grams: Map[Long, Set[String]] = docs.map { case (id, text, _) =>
      id -> toks(text).sliding(Curation.ContamN).filter(_.length == Curation.ContamN)
        .map(_.mkString(" ")).toSet
    }.toMap
    val evalSet = grams.collect {
      case (id, g) if id % Curation.EvalMod == 0 => g
    }.flatten.toSet
    val expected = grams.toSeq
      .filter { case (id, _) => id % Curation.EvalMod != 0 }
      .map { case (id, g) => (id, g.size.toLong, g.count(evalSet.contains).toLong) }
      .filter(_._3 > 0)
      .sortBy(_._1)
    val got = Curation.contamination(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // and the reported ratio is overlap / total with exact-rational
    // HALF_UP rounding (ratio4's int64 arithmetic)
    Curation.contamination(spark, sf).collect().foreach { r =>
      val (tot, cont) = (r.getLong(1), r.getLong(2))
      assert(r.getDouble(3) == ((cont * 10000L + tot / 2) / tot) / 10000.0)
    }
  }

  test("incremental contamination: batch fold equals the full pass") {
    val d = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val evalSh = Curation.shingleHashesOf(
      d.filter(col("doc_id") % Curation.EvalMod === 0)).select("sh").distinct()
      .localCheckpoint(true) // the persisted eval table
    val train = d.filter(col("doc_id") % Curation.EvalMod =!= 0)
    val b1 = Curation.contaminationOf(train.filter(col("doc_id") % 2 === 0), evalSh)
    val b2 = Curation.contaminationOf(train.filter(col("doc_id") % 2 =!= 0), evalSh)
    val folded = b1.unionByName(b2).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val full = Curation.contamination(spark, sf).collect().map(_.toSeq).toSeq
    assert(folded == full)
  }

  test("stratifiedSample is deterministic, within-stratum bounded, and keeps small strata whole") {
    val target = 3 // sf0.001 sources hold 2-5 docs → both branches exercised
    val a = Curation.stratifiedSample(spark, sf, target).collect().toSeq
    val b = Curation.stratifiedSample(spark, sf, target).collect().toSeq
    assert(a == b, "same inputs must select the same sample")
    val bySource = docs.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    val kept = a.map(r => (r.getString(0), r.getLong(1)))
    kept.foreach { case (s, id) => assert(bySource(s).contains(id)) }
    val keptBySource = kept.groupBy(_._1).view.mapValues(_.size).toMap
    bySource.foreach { case (s, ids) =>
      if (ids.size <= target)
        assert(keptBySource.getOrElse(s, 0) == ids.size,
          s"source $s has ${ids.size} <= target docs and must be kept whole")
    }
  }

  test("bpePairCounts matches a naive adjacent-pair frequency model") {
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, text, _) =>
      toks(text).sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) += 1)
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Curation.bpePairCounts(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == expected)
  }

  test("bpeTrainMerges matches a sequential in-memory BPE trainer") {
    import spark.implicits._
    // crafted corpus with clear merge structure + ties to exercise the
    // (count desc, pair asc) tie-break and non-overlapping greedy merge
    val words = Seq("aaaa" -> 3L, "aab" -> 2L, "banana" -> 4L,
      "bana" -> 1L, "ab" -> 5L, "x" -> 2L)
    // naive model: word types as symbol vectors, greedy merges
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val expect = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to 5) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sy, n) <- vocab; i <- 0 until sy.size - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + n
      val ((l, rr), cnt) = counts.toSeq.minBy { case ((l, rr), c) => (-c, l + " " + rr) }
      expect += ((r.toLong, l, rr, l + rr, cnt))
      vocab = vocab.map { case (sy, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sy.size) {
          if (i + 1 < sy.size && sy(i) == l && sy(i + 1) == rr) {
            out += l + rr; i += 2
          } else { out += sy(i); i += 1 }
        }
        (out.result(), n)
      }
    }
    val got = Curation.bpeTrainMergesOf(spark, words.toDF("w", "n"), rounds = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expect.result())
  }

  test("bpeEncodedSymbols matches naive sequential merge application") {
    import spark.implicits._
    val words = Seq("aaaa" -> 3L, "aab" -> 2L, "banana" -> 4L,
      "bana" -> 1L, "ab" -> 5L, "x" -> 2L)
    val wordsDf = words.toDF("w", "n")
    val merges = Curation.bpeTrainMergesLocal(wordsDf, rounds = 5)
    // naive: apply each merge greedily left-to-right per word
    def applyMerge(sy: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < sy.size) {
        if (i + 1 < sy.size && sy(i) == l && sy(i + 1) == r) { out += l + r; i += 2 }
        else { out += sy(i); i += 1 }
      }
      out.result()
    }
    val expect = words.map { case (w, _) =>
      var sy = w.map(_.toString).toVector
      for ((_, l, r, _, _) <- merges) sy = applyMerge(sy, l, r)
      w -> sy.size.toLong
    }.toMap
    val got = Curation.bpeEncodedSymbols(wordsDf, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("invertedIndex matches a naive posting-list model") {
    val postings = scala.collection.mutable.Map[String, Set[Long]]().withDefaultValue(Set.empty)
    docs.foreach { case (id, text, _) =>
      toks(text).distinct.foreach(t => postings(t) += id)
    }
    val expected = postings.toSeq
      .map { case (t, ids) => (t, ids.size.toLong, ids.toSeq.sorted.take(5).mkString(",")) }
      .sortBy { case (t, df, _) => (-df, t) }
      .take(20)
    val got = Curation.invertedIndex(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got == expected)
  }

  test("dedupManifest chases canonical references through mixed exact/near-dup chains") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    // 5 is an EXACT dup of 2 (normalization folds case) but a NEAR dup
    // of 9 (shingles are case-sensitive): 9's component minimum is 5,
    // which is itself dropped — the manifest must chase 9 → 5 → 2.
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    Seq(
      (2L, base.toUpperCase, "en", "srcA", base.length.toLong),
      (5L, base, "en", "srcA", base.length.toLong),
      (9L, base + " extra", "en", "srcB", base.length.toLong + 6)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Curation.dedupManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (2L, "keep_unique", 2L),
      (5L, "drop_exact", 2L),
      (9L, "drop_near_dup", 2L)),
      s"canonical chain 9→5→2 must resolve to the kept doc; got $got")
  }

  test("sourceMixReport matches an exact token-share and uniform-weight model") {
    val bySource = docs.groupBy(_._3).map { case (src, ds) =>
      src -> (ds.size.toLong, ds.map(d => toks(d._2).length.toLong).sum)
    }
    val total = bySource.values.map(_._2).sum
    val nSources = bySource.size.toLong
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, (nd, nt)) =>
      (src, nd, nt, ratio4Model(nt, total), ratio4Model(total / nSources, nt))
    }
    val got = Curation.sourceMixReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the weights rebalance: at least one source needs up- and one
    // needs down-sampling unless the mix is already exactly uniform
    assert(got.map(_._5).distinct.size > 1 || got.forall(_._5 == 1.0))
  }

  test("epochPlan matches a capped-greedy uniform-target model") {
    val bySource = docs.groupBy(_._3).view
      .mapValues(_.map(d => toks(d._2).length.toLong).sum).toMap
    val total = bySource.values.sum
    val target = total / bySource.size
    val plannedTotal = bySource.values
      .map(nt => math.min(target, nt * Curation.MaxEpochs)).sum
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, nt) =>
      val planned = math.min(target, nt * Curation.MaxEpochs)
      (src, nt, target, planned, ratio4Model(planned, nt),
        target - planned, ratio4Model(planned, plannedTotal))
    }
    val got = Curation.epochPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expected)
    // invariants: epochs never exceed the cap; deficits only where the
    // cap binds; a source at the target has zero deficit
    got.foreach { case (_, _, tgt, planned, epochs, deficit, _) =>
      assert(epochs <= Curation.MaxEpochs.toDouble)
      assert(deficit >= 0 && (deficit == 0 || planned < tgt))
    }
  }

  test("crossSourcePairs = near-dup pairs restricted to differing sources") {
    val srcOf = docs.map { case (id, _, s) => id -> s }.toMap
    val all = MinHashLSH.nearDupPairs(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = all.filter { case (d1, d2) => srcOf(d1) != srcOf(d2) }.sorted
    val got = Curation.crossSourcePairs(spark, sf).collect().toSeq
      .map { r => assert(r.getString(2) != r.getString(3)); (r.getLong(0), r.getLong(1)) }
      .sorted
    assert(got == expected)
  }
}
