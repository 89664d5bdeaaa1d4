package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Spectral tier over the embedding corpus: the one-pass moment rows
  * against a naive driver model, and the power-iteration eigenpair's
  * defining properties (residual + dominance). */
class SpectralSpec extends SparkSpec {

  private val d = Similarity.Dim

  /** Driver model: collect the sf0.001 embeddings (500 × 64) and fold
    * the same u3 quantization by hand. */
  private lazy val u3: Array[Array[Long]] =
    Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.round(x.toDouble * 1000d)))

  test("covariance moment rows equal the naive driver model") {
    val rows = Spectral.covariance(spark, sf).collect()
    assert(rows.length === d * (d + 1) / 2)
    val n = u3.length.toLong
    // spot-check a deterministic spread of cells incl. the triangle edges
    val picks = Seq((0, 0), (0, 1), (0, d - 1), (3, 17), (31, 32), (d - 1, d - 1))
    val byIj = rows.map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r)).toMap
    picks.foreach { case (i, j) =>
      val r = byIj((i, j))
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === u3.map(_(i)).sum, s"s_i at ($i,$j)")
      assert(r.getLong(4) === u3.map(_(j)).sum, s"s_j at ($i,$j)")
      assert(r.getLong(5) === u3.map(v => v(i) * v(j)).sum, s"p_ij at ($i,$j)")
    }
  }

  test("covariance plan is one aggregate pass: no join, no corpus explode") {
    val plan = Spectral.covariance(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("gram_sum_agg"))
    assert(!plan.contains("Join"))
  }

  test("topComponent satisfies the eigen residual and dominates probes") {
    val (lambda, v) = Spectral.topComponent(spark, sf)
    assert(lambda > 0)
    // rebuild the covariance matrix the same way topComponent does
    val n = u3.length.toDouble
    val s = Array.tabulate(d)(i => u3.map(_(i)).sum.toDouble)
    val cov = Array.tabulate(d, d) { (i, j) =>
      (n * u3.map(r => r(i) * r(j)).sum - s(i) * s(j)) / (n * n)
    }
    def mul(x: Array[Double]) =
      Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * x(j)).sum)
    val av = mul(v)
    val resid = math.sqrt(v.indices.map(i => math.pow(av(i) - lambda * v(i), 2)).sum)
    assert(resid <= 1e-6 * lambda, s"residual $resid vs λ=$lambda")
    // Rayleigh dominance: λ beats every axis-aligned probe direction
    for (i <- 0 until d) assert(lambda >= cov(i)(i) - 1e-9 * lambda)
  }

  test("jacobi spectrum: orthonormal, residual-tight, trace-complete") {
    val (eigs, vecs) = Spectral.spectrum(spark, sf)
    assert(eigs.length === d)
    // descending order
    assert(eigs.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // rebuild the covariance matrix from the driver model
    val n = u3.length.toDouble
    val s = Array.tabulate(d)(i => u3.map(_(i)).sum.toDouble)
    val cov = Array.tabulate(d, d) { (i, j) =>
      (n * u3.map(r => r(i) * r(j)).sum - s(i) * s(j)) / (n * n)
    }
    val scale = eigs.map(math.abs).max
    // eigen residual per pair: ‖A v_k − λ_k v_k‖ small relative to λ_max
    for (k <- 0 until d) {
      val vk = Array.tabulate(d)(r => vecs(r)(k))
      val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * vk(j)).sum)
      val resid = math.sqrt(
        (0 until d).map(i => math.pow(av(i) - eigs(k) * vk(i), 2)).sum)
      assert(resid <= 1e-8 * scale, s"residual $resid for eig $k = ${eigs(k)}")
    }
    // orthonormal columns
    for (k <- 0 until d; l <- k until d) {
      val dot = (0 until d).map(r => vecs(r)(k) * vecs(r)(l)).sum
      val want = if (k == l) 1.0 else 0.0
      assert(math.abs(dot - want) <= 1e-10, s"gram ($k,$l) = $dot")
    }
    // trace identity: Σλ == Σ cov_ii
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(eigs.sum - trace) <= 1e-6 * math.abs(trace))
    // the power-iteration top component agrees with the Jacobi top
    val (lambda, _) = Spectral.topComponent(spark, sf)
    assert(math.abs(lambda - eigs(0)) <= 1e-6 * eigs(0))
  }

  test("effectiveRank: isotropic → d, collapsed → 1, corpus in between") {
    assert(math.abs(Spectral.effectiveRank(Array.fill(8)(3.0)) - 8.0) < 1e-12)
    assert(math.abs(Spectral.effectiveRank(Array(5.0, 0, 0, 0)) - 1.0) < 1e-12)
    val (eigs, _) = Spectral.spectrum(spark, sf)
    val er = Spectral.effectiveRank(eigs)
    assert(er > 1.0 && er <= d.toDouble)
  }

  /** Driver model with labels and ids, same u3 quantization. */
  private lazy val labeled: Array[(Long, Long, Array[Long])] =
    Tables.embeddings(spark, sf).select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray.map(x => math.round(x.toDouble * 1000d))))

  private val K = Spectral.CentShift

  /** Shifted halfUp centroid per dim — positive numerator, so Scala
    * Long `/` (trunc) == floor == both engines. */
  private def cents(n: Long, s: Array[Long]): Array[Long] =
    s.map(si => ((si + K * n) * 1000 + n / 2) / n)

  test("labelScatter equals the exact-integer driver model") {
    val rows = Spectral.labelScatter(spark, sf).collect()
    val gN = labeled.length.toLong
    val gS = Array.tabulate(d)(i => labeled.map(_._3(i)).sum)
    val cg = cents(gN, gS)
    val byLabel = labeled.groupBy(_._2)
    assert(rows.length === byLabel.size)
    rows.foreach { r =>
      val vs = byLabel(r.getLong(0)).map(_._3)
      val n = vs.length.toLong
      assert(r.getLong(1) === n, s"n_vecs for label ${r.getLong(0)}")
      val s = Array.tabulate(d)(i => vs.map(_(i)).sum)
      val p = Array.tabulate(d)(i => vs.map(v => v(i) * v(i)).sum)
      val cl = cents(n, s)
      val dist2 = (0 until d).map(i => (cl(i) - cg(i)) * (cl(i) - cg(i))).sum
      assert(r.getLong(2) === dist2, s"dist2 for label ${r.getLong(0)}")
      val within = (0 until d).map { i =>
        ((n * p(i) - s(i) * s(i)) * 100 + (n * n) / 2) / (n * n) * 10000
      }.sum
      assert(r.getLong(3) === within, s"within for label ${r.getLong(0)}")
      val den = math.max(within, 1L)
      val sep4 = ((dist2 * 10000 + den / 2) / den) / 10000.0
      assert(r.getDouble(4) === sep4, s"sep4 for label ${r.getLong(0)}")
    }
  }

  test("labelScatter plan: one grouped moment pass, global row broadcast") {
    val plan = Spectral.labelScatter(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("gram_sum_agg"))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("outliers equals the exact-integer driver model top-k") {
    val gN = labeled.length.toLong
    val gS = Array.tabulate(d)(i => labeled.map(_._3(i)).sum)
    val c = cents(gN, gS)
    val scored = labeled.map { case (id, _, u) =>
      (id, (0 until d).map(i =>
        ((u(i) + K) * 1000 - c(i)) * ((u(i) + K) * 1000 - c(i))).sum)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Spectral.outliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === scored.toSeq)
  }

  test("outliers plan: TakeOrdered over a broadcast centroid, no pair join") {
    val plan = Spectral.outliers(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("exactDups groups byte-identical u3 vectors under the min keeper") {
    val byU3 = labeled.map { case (id, _, u) => (id, u.mkString(",")) }
    val keep = byU3.groupBy(_._2).values
      .flatMap(g => g.map(v => v._1 -> g.map(_._1).min)).toMap
    val got = Spectral.exactDups(spark, sf).collect()
    assert(got.length === labeled.length)
    got.foreach { r =>
      assert(r.getLong(2) === keep(r.getLong(0)), s"vec ${r.getLong(0)}")
      assert(r.getBoolean(3) === (r.getLong(0) != keep(r.getLong(0))))
    }
  }

  test("whiten: the whitened corpus has (near-)identity covariance") {
    val rows = Spectral.whiten(spark, sf).collect()
      .map(r => r.getSeq[Double](1).toArray)
    assert(rows.length === labeled.length)
    val n = rows.length.toDouble
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    // whitened mean is ~0 (centering happened inside the transform)
    mean.foreach(m => assert(math.abs(m) < 1e-6, s"mean $m"))
    val (eigs, _) = Spectral.spectrum(spark, sf)
    val lmax = eigs.max
    for (i <- 0 until d; j <- i until d) {
      val cij = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      // directions clipped at eps·λmax can't reach unit variance; on
      // this corpus all eigenvalues clear the clip, so the identity
      // must hold tightly everywhere
      assert(eigs(d - 1) > 1e-6 * lmax, "fixture spectrum unexpectedly rank-deficient")
      assert(math.abs(cij - want) < 1e-6, s"cov($i,$j) = $cij")
    }
  }

  test("jacobi converges on equal-diagonal blocks (duplicated channels)") {
    // a(p)(p) == a(q)(q) with a nonzero off-diagonal makes theta = 0;
    // signum(0) = 0 would pick the identity rotation and stall the
    // sweep loop — the 45° branch (t = 1) must zero the entry instead.
    // [[1,1],[1,1]] is the exactly-duplicated-channel covariance.
    val (e1, v1) = Spectral.jacobiEigen(Array(Array(1.0, 1.0), Array(1.0, 1.0)))
    assert(math.abs(e1(0) - 2.0) < 1e-12 && math.abs(e1(1)) < 1e-12, e1.toSeq)
    // eigenvectors stay orthonormal through the 45° rotations
    val dot = v1(0)(0) * v1(0)(1) + v1(1)(0) * v1(1)(1)
    assert(math.abs(dot) < 1e-12)
    // equal-diagonal blocks embedded in a larger matrix converge too
    val m = Array(
      Array(3.0, 1.0, 0.0, 0.5),
      Array(1.0, 3.0, 0.2, 0.0),
      Array(0.0, 0.2, 3.0, 1.0),
      Array(0.5, 0.0, 1.0, 3.0))
    val (e4, v4) = Spectral.jacobiEigen(m)
    assert(math.abs(e4.sum - 12.0) < 1e-9) // trace preserved
    // residual check: M v = λ v for every pair
    for (c <- 0 until 4) {
      val r = (0 until 4).map { i =>
        val mv = (0 until 4).map(j => m(i)(j) * v4(j)(c)).sum
        math.abs(mv - e4(c) * v4(i)(c))
      }.max
      assert(r < 1e-9, s"column $c residual $r")
    }
  }

  test("whiten runs exactly one distributed moment pass") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    def jobsDuring(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      counter.set(0)
      try { body; Thread.sleep(300); counter.get() }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    val one = jobsDuring { Spectral.covariance(spark, sf).collect() }
    // whiten's DRIVER work (eigen + μ) must cost exactly the one
    // GramSumAgg collect — a second covariance() scan for the mean
    // would DOUBLE the job count (building the returned frame launches
    // no job). AQE splits a collect into a variable ±1 job count, so
    // the pin is the doubling guard, not exact equality.
    val w = jobsDuring { Spectral.whiten(spark, sf) }
    assert(w <= one + 1, s"whiten launched $w jobs vs $one for one moment pass")
    assert(w < 2 * one, s"whiten re-ran the corpus scan: $w jobs vs $one")
    assert(w > 0, "whiten must have collected the moment rows")
  }

  test("snapshotDrift matches the exact shifted-centroid model") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray))
    val K = Spectral.CentShift
    def cent(half: Array[(Long, Array[Long])], i: Int): Long = {
      val n = half.length.toLong
      val s = half.map(_._2(i)).sum
      ((s + K * n) * 1000 + n / 2) / n
    }
    val (a, b) = vecs.partition(_._1 % 2 == 0)
    val got = Spectral.snapshotDrift(spark, sf).collect()
    assert(got.length === d)
    got.foreach { r =>
      val i = r.getLong(0).toInt
      assert(r.getLong(1) === a.length.toLong && r.getLong(2) === b.length.toLong)
      assert(r.getLong(3) === a.map(_._2(i)).sum, s"s_a dim $i")
      assert(r.getLong(4) === b.map(_._2(i)).sum, s"s_b dim $i")
      assert(r.getLong(5) === cent(a, i) - cent(b, i), s"delta dim $i")
    }
    // the plan is one grouped moment pass — no per-row dim explode
    val p = Spectral.snapshotDrift(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("gram_sum"), p.take(400))
  }

  test("power iteration is deterministic") {
    val m = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val (l1, v1) = Spectral.powerIterate(m, 100)
    val (l2, v2) = Spectral.powerIterate(m, 100)
    assert(l1 === l2)
    assert(v1.toSeq === v2.toSeq)
    // known top eigenvalue of [[4,1],[1,3]]: (7+√5)/2
    assert(math.abs(l1 - (7 + math.sqrt(5)) / 2) < 1e-9)
  }
}
