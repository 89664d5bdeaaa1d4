package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operating-point regression pin (round-15, verdict item 4).
  *
  * The round-14 sweep (`dedup_minhash_tuning`) chose k=24 perms ×
  * (8 bands × 3 rows) by MEASURING recall against the exact
  * prefix-join truth — overall 0.49→0.86, near-τ 0.40→0.83 at native
  * sf1. That choice is load-bearing for every MinHash-fed panel, and
  * until this spec only a manual re-run of the sweep would notice a
  * default or hashing change quietly undoing it. This suite asserts
  * recall floors directly, so `sbt test` fails if the operating point
  * regresses.
  *
  * Two corpora:
  *  - sf0.01 (the driver's correctness scale): every exact pair there
  *    is high-jaccard (j ≥ 0.9 — measured; the near-τ band is EMPTY at
  *    this sf), so the floor is recall = 1.0 with the band assertion
  *    guarded on band population.
  *  - a deterministic synthetic corpus whose pairs are CONSTRUCTED to
  *    populate the near-τ band j ∈ [0.50, 0.65) — the S-curve's weak
  *    region, where the retune bought its recall. Ground truth is an
  *    in-memory brute-force jaccard over the same shingle model
  *    (whitespace tokens → distinct 3-gram shingles), independent of
  *    every library code path.
  *
  * Floors sit ~0.08 under the measured values (measured on this
  * corpus: overall 0.889, near-τ 0.829; sf0.01: 1.0) — tight enough that
  * falling back to the old 16×(4×4) point (which measured 0.49/0.40)
  * fails loudly, loose enough to survive an intentional re-seed.
  */
class RecallFloorSpec extends SparkSpec {

  test("shipped defaults are the sweep's chosen operating point") {
    // flipped 16×(4×4) → 24×(8×3) by the measured round-14 sweep; a
    // change here must come with a re-run of dedup_minhash_tuning and
    // new floors below
    assert(MinHashLSH.NumSeeds == 24)
    assert(MinHashLSH.BandRows == 3)
    assert(MinHashLSH.NumSeeds % MinHashLSH.BandRows == 0)
  }

  test("sf0.01: banded LSH catches every exact pair (all high-j at this sf)") {
    val dir = "/root/testdata/sf0.01"
    val r = MinHashLSH.minhashRecall(spark, dir).collect().head
    val (nExact, nBoth) = (r.getLong(0), r.getLong(2))
    assert(nExact > 0L)
    assert(nBoth == nExact, s"recall dropped: $nBoth of $nExact exact pairs")
  }

  // ---- synthetic near-τ corpus ----------------------------------------

  /** Mirror of the library's shingle model: whitespace tokens →
    * distinct 3-gram shingles. */
  private def shinglesOf(text: String): Set[String] = {
    val t = text.split("\\s+").filter(_.nonEmpty)
    (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
  }

  /** (docs, texts): `nPairs` doc pairs with shingle jaccard spread over
    * [jLo, jHi) via a shared prefix + unique tails, plus noise docs.
    * Every token is globally unique except within a pair's shared
    * segment, so the constructed jaccard is exact and no cross-pair
    * collisions exist. Deterministic: token ids are sequential. */
  private def corpus(): Seq[(Long, String)] = {
    var tok = 0
    def fresh(k: Int): Seq[String] = {
      val out = (tok until tok + k).map(i => s"t$i")
      tok += k
      out
    }
    val docLen = 60
    val pairSpecs =
      // near-τ band: 120 pairs, targets uniform over [0.50, 0.65)
      (0 until 120).map(i => 0.50 + 0.15 * i / 120.0) ++
      // easy mass: 60 pairs over [0.70, 0.95)
      (0 until 60).map(i => 0.70 + 0.25 * i / 60.0)
    var id = 0L
    val docs = Seq.newBuilder[(Long, String)]
    pairSpecs.foreach { j =>
      // shared-prefix construction: s shared tokens give s-2 shared
      // shingles of 2·(docLen-2) - (s-2) in the union
      val s = math.round(2.0 * j / (1.0 + j) * (docLen - 2)).toInt + 2
      val shared = fresh(s)
      docs += ((id, (shared ++ fresh(docLen - s)).mkString(" ")))
      docs += ((id + 1, (shared ++ fresh(docLen - s)).mkString(" ")))
      id += 2
    }
    (0 until 200).foreach { _ =>
      docs += ((id, fresh(40).mkString(" ")))
      id += 1
    }
    docs.result()
  }

  test("synthetic near-τ corpus: recall floors hold at the shipped point") {
    import spark.implicits._
    val rows = corpus()
    val docs = rows.toDF("doc_id", "text")

    // independent exact truth: brute-force jaccard over the model
    val sh = rows.map { case (i, t) => i -> shinglesOf(t) }.toMap
    val ids = rows.map(_._1)
    val exact = for {
      a <- ids; b <- ids if a < b
      inter = (sh(a) & sh(b)).size
      union = sh(a).size + sh(b).size - inter
      if inter * 2 >= union // j >= 0.5 exactly, integer arithmetic
    } yield ((a, b), inter.toLong * 10000 / union)
    val exactMap = exact.toMap
    assert(exactMap.size == 180, "construction drifted: expected 180 true pairs")

    val caught = MinHashLSH.nearDupPairsOf(docs, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(caught.subsetOf(exactMap.keySet),
      "verify gate leaked a non-exact pair")

    val nearTau = exactMap.filter(_._2 < 6500L).keySet
    assert(nearTau.size >= 100, s"near-τ band underpopulated: ${nearTau.size}")
    val overall = caught.size.toDouble / exactMap.size
    val lo = (caught & nearTau).size.toDouble / nearTau.size
    info(f"overall recall = $overall%.4f, near-τ recall = $lo%.4f " +
      f"(${caught.size}/${exactMap.size}, ${(caught & nearTau).size}/${nearTau.size})")
    assert(overall >= 0.80, f"overall recall $overall%.4f under floor 0.80")
    assert(lo >= 0.75, f"near-τ recall $lo%.4f under floor 0.75")
  }
}
