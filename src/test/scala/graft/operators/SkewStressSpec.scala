package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The O(1)-state claim under a degenerate hot key: one digest carrying
  * 200k rows must stream through the chain operator without per-group
  * materialization blowing up, and produce the exact greedy chain. */
class SkewStressSpec extends SparkSpec {

  test("chainNative handles a 200k-row hot digest exactly and in one pass") {
    val hot = spark.range(200000).select(
      col("id").as("event_id"),
      (col("id") * 1000000L).as("ts_us"), // 1s apart
      lit(7L).as("user_id"),
      lit("hot").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"),
      lit(42L).as("digest")) // every row same digest
    val kept = Dedup.chainNative(hot, windowUs = 3600L * 1000000L).count()
    // greedy chain keeps every 3600th second → 200000/3600 rounded up
    assert(kept === (200000 + 3599) / 3600)
  }

  test("firstOccurrence on the hot digest keeps exactly one row") {
    val hot = spark.range(100000).select(
      col("id").as("event_id"), col("id").as("ts_us"),
      lit(7L).as("user_id"), lit("hot").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"), lit(42L).as("digest"))
    assert(Dedup.firstOccurrence(hot).count() === 1)
  }

  test("boilerplate shingle shared by 150 docs is df-capped out of ngram candidates") {
    import spark.implicits._
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    val docs = (0 until 150).map { i =>
      val tail =
        if (i < 2) "alpha beta gamma delta epsilon zeta"
        else s"unique$i token$i word$i extra$i more$i end$i"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val pairs = DocDedup.ngramJaccardOf(DocDedup.docShinglesOf(docs)).collect()
    // every boilerplate shingle has df=150 > MaxShingleDf → excluded from
    // candidate generation AND the Jaccard definition; only docs 0 and 1
    // share surviving (tail + boundary) shingles.
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("overfull LSH bucket (150 identical docs) is capped; small buckets survive") {
    import spark.implicits._
    val boilerDoc = "the same exact document body repeated verbatim across the whole corpus"
    val dupDoc = "completely different content about catalyst optimizer internals and query planning"
    val docs = ((0 until 150).map(i => (i.toLong, boilerDoc)) ++
      Seq((900L, dupDoc), (901L, dupDoc))).toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDupPairsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The 150 identical docs collapse into one bucket of size 150 >
    // MaxBucketSize → dropped (the 11k degenerate pairs are exact dups —
    // dedup_exact_docs territory, not near-dup's). The 2-doc bucket for
    // the 900/901 pair is untouched.
    assert(pairs === Set((900L, 901L)))
    // simhash byte buckets behave the same way under the same corpus
    val simPairs = SimHash.nearDupPairsOfShingles(
        DocDedup.docShinglesOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simPairs === Set((900L, 901L)))
  }

  test("saltedAggOf is bit-identical to the direct aggregation on a degenerate hot key") {
    // one hot type carries ~99% of rows — the shape events_key_skew
    // warns about; the exact decimal partials make the two-stage merge
    // order-independent, so salted == direct to the bit
    val ev = spark.range(100000).select(
      col("id").as("event_id"), col("id").as("ts_us"),
      lit(7L).as("user_id"),
      when(pmod(col("id"), lit(100L)) === 0L, lit("rare"))
        .otherwise(lit("hot")).as("event_type"),
      (col("id") % 997L / lit(10.0)).as("value"),
      lit("{}").as("props"))
    val direct = Skew.directAggOf(ev).collect().toSeq
    val salted = Skew.saltedAggOf(ev).collect().toSeq
    assert(salted == direct)
    assert(direct.map(_.getString(0)) == Seq("hot", "rare"))
  }
}
