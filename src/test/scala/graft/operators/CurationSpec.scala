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
    // and the reported ratio is overlap / total
    Curation.contamination(spark, sf).collect().foreach { r =>
      assert(r.getDouble(3) ==
        BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
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
