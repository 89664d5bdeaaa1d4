package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property harness for [[Ranking.groupedQuantiles]]: on randomized
  * grouped long data — skewed group sizes, duplicate values, singleton
  * and two-element groups, negative values — the GlobalRank path is
  * BIT-equal to Spark's `percentile` aggregate for every probed
  * position. Deterministic seeds (the repo's no-Math.random discipline)
  * so a failure reproduces exactly.
  */
class GroupedQuantilesPropSpec extends SparkSpec {

  private val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  private def dataset(seed: Long): Seq[(String, Long, Long)] = {
    // group count 1..8; per-group size 1..60 (heavily skewed: one group
    // gets ×20); values from a SMALL domain so duplicates are common
    val g = for {
      nGroups <- Gen.choose(1, 8)
      sizes <- Gen.sequence[Seq[Int], Int](
        (0 until nGroups).map(i => Gen.choose(1, if (i == 0) 60 else 12)))
      values <- Gen.sequence[Seq[Seq[Long]], Seq[Long]](sizes.map(sz =>
        Gen.listOfN(sz, Gen.choose(-50L, 50L)).map(_.toSeq)))
    } yield values.zipWithIndex.flatMap { case (vs, gi) =>
      vs.zipWithIndex.map { case (v, i) => (s"g$gi", v, (gi * 1000 + i).toLong) }
    }
    g.apply(Gen.Parameters.default, Seed(seed)).get
  }

  test("groupedQuantiles == percentile aggregate on 12 randomized datasets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1L to 12L).foreach { seed =>
      val rows = dataset(seed)
      val df = rows.toDF("grp", "v", "tie")
      val got = Ranking.groupedQuantiles(df, Seq("grp"), "v", Seq("tie"), ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      val agg = df.groupBy("grp")
        .agg(expr(s"percentile(v, array(${ps.map(p => s"${p}D").mkString(", ")}))")
          .as("q")).collect()
        .flatMap(r => ps.zipWithIndex.map { case (p, i) =>
          (r.getString(0), p) -> r.getSeq[Double](1)(i)
        }).toMap
      assert(got.keySet === agg.keySet, s"seed $seed key sets")
      got.foreach { case (k, v) =>
        // bit equality: the interpolation formula is replicated exactly
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(agg(k)), s"seed $seed at $k")
      }
    }
  }

  test("singleton and all-equal groups: quantiles at the value (to IEEE interp)") {
    import spark.implicits._
    val df = Seq(("a", 7L, 1L), ("b", -3L, 2L), ("b", -3L, 3L), ("b", -3L, 4L))
      .toDF("grp", "v", "tie")
    val got = Ranking.groupedQuantiles(df, Seq("grp"), "v", Seq("tie"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 2 * ps.length)
    got.foreach { case (g, _, q) =>
      // NOTE: not exact equality — interpolating between EQUAL values
      // pays one ulp-scale rounding (v·(1−f) + v·f ≠ v in IEEE, e.g.
      // −3·0.8 + −3·0.2 = −3.0000000000000004); Spark's percentile
      // aggregate produces the SAME doubles (bit-equality proven by the
      // randomized test above, whose domains are duplicate-heavy)
      assert(math.abs(q - (if (g == "a") 7.0 else -3.0)) < 1e-9)
    }
  }
}
