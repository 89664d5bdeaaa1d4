package graft.operators

import graft.SparkSpec

/** QualityModels vs independent in-memory models at sf0.001 (the
  * DuckDB oracle proves the same semantics cross-engine via the
  * driver; these pin them inside the JVM, including the exact clip /
  * halfUpDiv integer arithmetic). */
class QualityModelsSpec extends SparkSpec {

  private def halfUp(num: Long, den: Long): Long = (num + den / 2) / den

  private def clip4(x: Long): Long =
    math.min(math.max(x, QualityModels.ClipLo4), QualityModels.ClipHi4)

  /** In-memory twin of Hashing.h64 (md5 hex head as 60-bit int). */
  private def h64Model(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private lazy val docs: Seq[(Long, String, String, Seq[String])] =
    graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).trim.split("\\s+").filter(_.nonEmpty).toSeq))
      .toSeq

  private val curated = QualityModels.CuratedSources.toSet

  /** term -> (c_cur, c_rest, aff4) over the whole corpus. */
  private lazy val lexicon: Map[String, (Long, Long, Long)] = {
    val cur = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val rest = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, source, _, toks) =>
      val m = if (curated(source)) cur else rest
      toks.foreach(t => m(t) += 1)
    }
    (cur.keySet ++ rest.keySet).map { t =>
      t -> (cur(t), rest(t), clip4(halfUp((cur(t) + 1) * 10000L, rest(t) + 1)))
    }.toMap
  }

  test("lexiconHead is the top-50 affinity head with deterministic ties") {
    val expected = lexicon.toSeq
      .map { case (t, (c, r, a)) => (t, c, r, a / 10000.0) }
      .sortBy { case (t, _, _, a) => (-a, t) }
      .take(QualityModels.LexiconHead)
    val got = QualityModels.lexiconHead(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
  }

  test("lexiconScore is the exact per-token mean affinity with prior threshold") {
    val totCur = lexicon.values.map(_._1).sum + lexicon.size
    val totRest = lexicon.values.map(_._2).sum + lexicon.size
    val thr4 = halfUp(totCur * 10000L, totRest)
    val expected = docs.filter(_._4.nonEmpty).map { case (id, _, _, toks) =>
      val s4 = toks.map(t => lexicon(t)._3).sum
      val sc4 = halfUp(s4, toks.size.toLong)
      (id, toks.size.toLong, sc4 / 10000.0, if (sc4 >= thr4) 1 else 0)
    }.sortBy(_._1)
    val got = QualityModels.lexiconScore(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got == expected)
    // the curated/rest split must actually separate: both classes present
    assert(got.count(_._4 == 1) > 0 && got.count(_._4 == 0) > 0)
  }

  private def bigrams(toks: Seq[String]): Seq[(String, String)] =
    if (toks.size < 2) Seq.empty else toks.zip(toks.tail)

  test("lmFluency is the exact mean add-one conditional bigram probability") {
    val pair = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.filter(_._3 == "en").foreach(d => bigrams(d._4).foreach(b => pair(b) += 1))
    val ctx = pair.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v2 = pair.keySet.map(_._2).size.toLong
    val expected = docs.filter(_._4.size >= 2).map { case (id, _, _, toks) =>
      val bgs = bigrams(toks)
      val p4s = bgs.map { b =>
        val c12 = pair.getOrElse(b, 0L)
        val c1 = ctx.getOrElse(b._1, 0L)
        halfUp((c12 + 1) * 10000L, c1 + v2)
      }
      val nOov = bgs.count(b => !pair.contains(b)).toLong
      (id, bgs.size.toLong, nOov,
        halfUp(p4s.sum, bgs.size.toLong) / 10000.0)
    }.sortBy(_._1)
    val got = QualityModels.lmFluency(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // English documents must on average outscore non-English ones
    val byLang = docs.map(d => d._1 -> d._3).toMap
    val (en, non) = got.partition(g => byLang(g._1) == "en")
    assert(en.map(_._4).sum / en.size > non.map(_._4).sum / non.size)
  }

  test("incremental lexicon/dsir training folds to the full-corpus model") {
    import org.apache.spark.sql.functions._
    val all = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
    val (b1, b2) = (all.filter(col("doc_id") % 2 === 0),
      all.filter(col("doc_id") % 2 =!= 0))
    def key3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1.toString).toSeq
    val lexFold = QualityModels.lexiconMergeOf(
      QualityModels.lexiconMergeOf(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          QualityModels.lexiconTrain(spark, sf).schema), b1), b2)
    assert(key3(lexFold) == key3(QualityModels.lexiconTrain(spark, sf)))
    val dsirFold = QualityModels.dsirMergeOf(
      QualityModels.dsirMergeOf(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          QualityModels.dsirBucketTable(spark, sf).schema), b1), b2)
    assert(key3(dsirFold) == key3(QualityModels.dsirBucketTable(spark, sf)))
  }

  test("quality_model_eval reconciles with lexiconScore x curated labels") {
    import org.apache.spark.sql.functions._
    val labels = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> (if (curated(r.getString(1))) 1 else 0)).toMap
    val scored = QualityModels.lexiconScore(spark, sf).collect()
      .map(r => (labels(r.getLong(0)), r.getInt(3),
        math.round(r.getDouble(2) * 10000)))
    val expected = scored.groupBy(s => (s._1, s._2)).map { case ((l, p), xs) =>
      val n = xs.length.toLong
      (l, p, n, ratio4Model(n, scored.count(_._1 == l).toLong),
        (xs.map(_._3).sum + n / 2) / n, l == p)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = QualityModels.modelEval(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got == expected)
    // all four cells populated and each label row closes to 1.0
    assert(got.map(g => (g._1, g._2)).toSet.size == got.size)
    got.groupBy(_._1).values.foreach(rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 2e-4))
  }

  test("calibrationCurve: decile model reconciles and the ranking carries signal") {
    import org.apache.spark.sql.functions._
    val labels = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> (if (curated(r.getString(1))) 1L else 0L)).toMap
    val scored = QualityModels.lexiconScore(spark, sf).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(2) * 10000)))
    val n = scored.length.toLong
    val decOf = scored.sortBy(s => (s._2, s._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i.toLong * 10 / n + 1) }.toMap
    val want = scored.groupBy(s => decOf(s._1)).map { case (d, xs) =>
      val nd = xs.length.toLong
      val pos = xs.map(x => labels(x._1)).sum
      d -> (nd, pos, ratio4Model(pos, nd),
        (xs.map(_._2).sum + nd / 2) / nd)
    }
    val got = QualityModels.calibrationCurve(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
        === want(r.getLong(0)), s"decile ${r.getLong(0)}")
    }
    // the model ranks: the top decile is richer in curated docs than
    // the bottom one
    val byDec = got.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byDec(byDec.keySet.max) > byDec(byDec.keySet.min))
  }

  test("TTL retirement inverts the merge: windowed models forget expired data exactly") {
    import org.apache.spark.sql.functions._
    val all = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
    val (expired, live) = (all.filter(col("doc_id") % 3 === 0),
      all.filter(col("doc_id") % 3 =!= 0))
    def key3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1.toString).toSeq
    // retire(train(expired ∪ live), expired) == train-on-live-only:
    // the full model minus an expired window is EXACTLY the model that
    // never saw it — affinities recomputed, zeroed terms dropped
    val lexFull = QualityModels.lexiconTrain(spark, sf).localCheckpoint()
    val lexLive = QualityModels.lexiconMergeOf(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), lexFull.schema),
      live)
    assert(key3(QualityModels.lexiconRetireOf(lexFull, expired)) == key3(lexLive))
    // merge-then-retire round-trips to the prior model
    val lexPrior = QualityModels.lexiconMergeOf(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), lexFull.schema),
      live).localCheckpoint()
    assert(key3(QualityModels.lexiconRetireOf(
      QualityModels.lexiconMergeOf(lexPrior, expired), expired)) == key3(lexPrior))
    // the DSIR bucket model supports the same inverse
    val dsirFull = QualityModels.dsirBucketTable(spark, sf).localCheckpoint()
    val dsirLive = QualityModels.dsirMergeOf(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), dsirFull.schema),
      live)
    assert(key3(QualityModels.dsirRetireOf(dsirFull, expired)) == key3(dsirLive))
  }

  test("dsirWeights is the exact mean hashed-bucket affinity") {
    val B = QualityModels.DsirBuckets.toLong
    def bucket(b: (String, String)): Long = h64Model(s"${b._1} ${b._2}") % B
    val ct = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cs = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.foreach { case (_, source, _, toks) =>
      val m = if (curated(source)) ct else cs
      bigrams(toks).foreach(b => m(bucket(b)) += 1)
    }
    def w4(bk: Long): Long = clip4(halfUp((ct(bk) + 1) * 10000L, cs(bk) + 1))
    val expected = docs.filter(_._4.size >= 2).map { case (id, _, _, toks) =>
      val bks = bigrams(toks).map(bucket)
      (id, bks.size.toLong, halfUp(bks.map(w4).sum, bks.size.toLong) / 10000.0)
    }.sortBy(_._1)
    val got = QualityModels.dsirWeights(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    // curated-source documents must on average carry higher importance
    val bySource = docs.map(d => d._1 -> d._2).toMap
    val (c, r) = got.partition(g => curated(bySource(g._1)))
    assert(c.map(_._3).sum / c.size > r.map(_._3).sum / r.size)
  }
  test("isotonicFit: minimax formulation equals a driver pool-adjacent-violators stack") {
    def halfUp(num: BigInt, den: BigInt): BigInt = (num * 2 + den) / (den * 2)
    val cal = QualityModels.calibrationCurve(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // classic PAV: merge adjacent blocks while the weighted rate order
    // is violated; compare rationals by cross-multiplication
    case class Block(p: BigInt, n: BigInt, size: Int)
    val stack = scala.collection.mutable.Stack[Block]()
    cal.foreach { case (_, nd, np, _) =>
      var b = Block(BigInt(np), BigInt(nd), 1)
      while (stack.nonEmpty && stack.top.p * b.n >= b.p * stack.top.n) {
        val t = stack.pop()
        b = Block(t.p + b.p, t.n + b.n, t.size + b.size)
      }
      stack.push(b)
    }
    val pav = stack.toSeq.reverse.flatMap(b =>
      Seq.fill(b.size)(halfUp(b.p * 10000, b.n).toLong / 1e4))
    val expected = cal.zip(pav).map { case ((d, nd, np, pr), fit) =>
      (d, nd, np, pr, fit)
    }
    val got = QualityModels.isotonicFit(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
    // the fit is monotone non-decreasing by construction
    val fits = got.sortBy(_._1).map(_._5)
    assert(fits == fits.sorted)
  }

}
