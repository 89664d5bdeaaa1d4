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
}
