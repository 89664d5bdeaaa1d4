package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spectral diagnostics over the embedding table — the covariance
  * tier above the per-dimension marginals (#220 `embeddings_dim_stats`
  * sees each dim alone; collapse, rotation drift and duplicated
  * feature channels only show up in the CROSS moments).
  *
  * Scale shape: everything reduces to ONE [[graft.plans.GramSumAgg]]
  * pass — a narrow scan folding each vector into a d(d+3)/2+1-long
  * moment buffer, partial-aggregable so map-side combine does the
  * heavy lifting and only O(d²) longs ever cross the wire. The d×d
  * eigen-analysis then runs on the driver (d=64 here; at 4096-dim
  * production embeddings the matrix is 16M doubles — still driver
  * math, the same place every distributed PCA puts it).
  */
object Spectral {

  import graft.operators.Similarity.Dim

  /** Quantized u3 vector (round(x·1000) per the dim-stats discipline)
    * — integer sums are order-independent, so the moment buffer is
    * bit-identical across partitionings and engines. */
  private def u3vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(transform(col("embedding"), x =>
        round(x.cast("double") * 1000d).cast("long")).as("u"))

  /** Same over an arbitrary (…, e: array) frame — what lets the
    * whitening transform TRAIN on a corpus subset (the saved-index
    * build half) instead of always the full table. */
  private def u3of(v: DataFrame): DataFrame =
    v.select(transform(col("e"), x =>
      round(x.cast("double") * 1000d).cast("long")).as("u"))

  /** #259 `embeddings_covariance`: the exact upper-triangle second
    * moments of the quantized embedding corpus — per (i ≤ j): n, the
    * two dimension sums and the cross-product sum, from which
    * cov(i,j) = (n·p_ij − s_i·s_j)/n² derives exactly. Emitted as raw
    * integers (the engine's cross-engine-determinism discipline);
    * [[topComponent]] consumes the same rows for the eigen tier.
    *
    * Shape: one GramSumAgg scan → a single 2145-long row → an O(d²)
    * driver-free explode into the 2080 entry rows. No join, no
    * shuffle of vector data, no N·d² row blowup (the unnest² form
    * this replaces is linear too but pays ~4096 generated rows per
    * vector — the oracle keeps that form, the engine never does). */
  def covariance(spark: SparkSession, dir: String): DataFrame =
    covarianceRows(u3vecs(spark, dir))

  /** [[covariance]] over an arbitrary (…, e) frame. */
  def covarianceOf(v: DataFrame): DataFrame = covarianceRows(u3of(v))

  private def covarianceRows(u3: DataFrame): DataFrame = {
    val d = Dim
    val g = u3
      .agg(graft.plans.GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
    // entry offset for (i,j), i ≤ j: 1 + d + i·d − i(i−1)/2 + (j−i)
    g.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
           |  transform(sequence(i, ${d - 1}), j -> struct(
           |    cast(i as bigint) as i, cast(j as bigint) as j,
           |    g[0] as n, g[1 + i] as s_i, g[1 + j] as s_j,
           |    g[${d + 1} + i * $d - (i * (i - 1)) div 2 + (j - i)] as p_ij))))"""
          .stripMargin)).as("r"))
      .select("r.*")
      .orderBy("i", "j")
  }

  /** Dominant principal component of the embedding covariance by
    * power iteration — the library tier over [[covariance]]'s moment
    * rows (collected: exactly d(d+1)/2 entries, O(d²) driver state by
    * design). Deterministic md5-seeded start vector; returns
    * (eigenvalue, eigenvector) in u3² covariance units. The spec pins
    * the eigen residual ‖Σv − λv‖ ≤ 1e-6·λ and dominance over probe
    * directions. */
  def topComponent(spark: SparkSession, dir: String,
                   iters: Int = 20000): (Double, Array[Double]) = {
    val d = Dim
    val rows = covariance(spark, dir).collect()
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val j = r.getLong(1).toInt
      val n = r.getLong(2).toDouble
      val c = (n * r.getLong(5) - r.getLong(3).toDouble * r.getLong(4)) / (n * n)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    powerIterate(cov, iters)
  }

  /** #268 `embeddings_label_scatter`: per-label cluster geometry in
    * exact integer arithmetic — the supervised companion to the
    * unsupervised spectrum. Per label: vector count, the squared
    * offset of the label centroid from the global centroid
    * (micro-u3² units: per-dim centroids are halfUpDiv(s_i·1000, n)
    * int64s, the offset is Σ_i (c_i^L − c_i)²) and the within-label
    * variance trace (Σ_i halfUpDiv(p_ii·10⁶, n_L) − (c_i^L)²), plus
    * the ratio4 separation (between/within) a clustering-quality gate
    * reads directly. Labels far from center with small within-trace
    * are tight, well-separated clusters; sep4 ≈ 0 means the labels
    * carry no geometry.
    *
    * Shape: ONE grouped GramSumAgg pass — the same mergeable moment
    * buffer, one per label (O(labels·d²) state, partial-aggregable);
    * the global row broadcasts; everything downstream is O(labels·d)
    * explode-free array math on the buffers. */
  def labelScatter(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing.{halfUpDiv, ratio4}
    val d = Dim
    val vecs = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 1000d).cast("long")).as("u"))
    val byLabel = vecs.groupBy("label")
      .agg(graft.plans.GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
    val global = vecs.agg(
      graft.plans.GramSumAggFunctions.gramSumAgg(col("u"), d).as("gg"))
    // SHIFTED centroid (micro-u3) per dim i: halfUp((s_i + K·n)·1000, n)
    // — the +K·n shift keeps the halfUp numerator positive (negative
    // dimension sums would hit the truncate-vs-floor integer-division
    // split between engines) and cancels EXACTLY in centroid
    // differences (K·n·1000 div n = K·1000, an exact multiple).
    // p_ii sits at buffer offset 1 + d + i·d − i(i−1)/2.
    def cent(buf: String, i: String, n: String) =
      s"((($buf[1 + $i] + ${CentShift}L * ($n)) * 1000 + ($n) div 2) div ($n))"
    def pii(buf: String, i: String) =
      s"$buf[${d + 1} + ($i) * $d - (($i) * (($i) - 1)) div 2]"
    byLabel.crossJoin(broadcast(global))
      .withColumn("n_vecs", expr("g[0]"))
      .withColumn("dist2_micro", expr(
        s"""aggregate(sequence(0, ${d - 1}), 0L, (acc, i) ->
           |  acc + (${cent("g", "i", "g[0]")} - ${cent("gg", "i", "gg[0]")})
           |      * (${cent("g", "i", "g[0]")} - ${cent("gg", "i", "gg[0]")}))"""
          .stripMargin))
      // within-variance per dim as (n·p_ii − s_i²)/n² — the scatter
      // form is non-negative by Cauchy–Schwarz, so the halfUp numerator
      // never goes negative; scaled ×100 before the divide and ×10⁴
      // after (full ×10⁶ pre-scaling overflows int64 once n·p_ii
      // passes ~10¹⁷ — centi-u3² rounding keeps headroom to ~10⁵×
      // this corpus, the documented knob)
      .withColumn("within_trace_micro", expr(
        s"""aggregate(sequence(0, ${d - 1}), 0L, (acc, i) ->
           |  acc + (((g[0] * ${pii("g", "i")} - g[1 + i] * g[1 + i]) * 100
           |          + (g[0] * g[0]) div 2) div (g[0] * g[0])) * 10000)"""
          .stripMargin))
      .select(col("label"), col("n_vecs"), col("dist2_micro"),
        col("within_trace_micro"),
        ratio4(col("dist2_micro"),
          greatest(col("within_trace_micro"), lit(1L))).as("sep4"))
      .orderBy("label")
  }

  /** Positivity shift for quantized-centroid arithmetic: added per dim
    * before the halfUp divide, cancelled exactly in differences. Any
    * bound above max |u3| works; 10⁶ covers |x| < 1000 — far past any
    * real embedding scale. */
  val CentShift = 1000000L

  /** `embeddings_snapshot_drift`: per-dimension mean drift between the
    * two snapshot halves (even vs odd vec_id — the established
    * split-half convention of appendedRecall/holdout): per dim, the
    * half sizes, exact integer u3 sums and the micro-u3 centroid delta
    * (shifted halfUp per the [[CentShift]] discipline, shift cancelling
    * exactly in the difference). The encoder-drift panel a re-train
    * gate reads: a handful of dims with large |delta| means the encoder
    * moved those channels between snapshots — exactly the drift the
    * frozen-quantizer index lifecycle (#300) re-trains on.
    *
    * Shape: ONE grouped GramSumAgg pass (2 mergeable moment buffers,
    * O(d²) longs total), pivoted to a single row, exploded driver-free
    * into the d output rows. No join, no vector-row shuffle. */
  def snapshotDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Dim
    val byHalf = Tables.embeddings(spark, dir)
      .select((col("vec_id") % 2 === 0).as("is_a"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 1000d).cast("long")).as("u"))
      .groupBy("is_a")
      .agg(graft.plans.GramSumAggFunctions.gramSumAgg(col("u"), d).as("g"))
    def cent(buf: String, i: String, n: String) =
      s"((($buf[1 + $i] + ${CentShift}L * ($n)) * 1000 + ($n) div 2) div ($n))"
    byHalf
      .agg(first(when(col("is_a"), col("g")), ignoreNulls = true).as("ga"),
        first(when(!col("is_a"), col("g")), ignoreNulls = true).as("gb"))
      .select(explode(expr(
        s"""transform(sequence(0, ${d - 1}), i -> struct(
           |  cast(i as bigint) as i,
           |  ga[0] as n_a, gb[0] as n_b,
           |  ga[1 + i] as s_a, gb[1 + i] as s_b,
           |  ${cent("ga", "i", "ga[0]")} - ${cent("gb", "i", "gb[0]")}
           |    as delta_micro))""".stripMargin)).as("r"))
      .select("r.*")
      .orderBy("i")
  }

  /** #269 `embeddings_outliers`: the top-k vectors by exact squared
    * distance to the global quantized centroid — the "broken vector"
    * audit (all-zero rows, mis-scaled batches and encoder NaN-fills
    * land at the extremes of this ranking). Score is Σ_i (u3_i·1000 −
    * c_i)² in micro-u3² int64 (deterministic ties broken by vec_id);
    * both sides carry the [[CentShift]] positivity shift (cancels in
    * the difference, keeps every halfUp divide floor==trunc so Spark
    * `div` and DuckDB `//` agree on negative dimension sums).
    *
    * Shape: the centroid comes off ONE aggregation row broadcast to a
    * narrow second pass (zip-free per-row array fold); top-k is a
    * TakeOrdered — no global sort materialized, no pair math. */
  def outliers(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val d = Dim
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 1000d).cast("long")).as("u"))
    val global = vecs.agg(
      graft.plans.GramSumAggFunctions.gramSumAgg(col("u"), d).as("gg"))
      .select(expr(s"""transform(sequence(0, ${d - 1}), i ->
        |  ((gg[1 + i] + ${CentShift}L * gg[0]) * 1000 + gg[0] div 2) div gg[0])"""
        .stripMargin).as("c"))
    vecs.crossJoin(broadcast(global))
      .withColumn("d2_micro", expr(
        s"""aggregate(sequence(0, ${d - 1}), 0L, (acc, i) ->
           |  acc + ((u[i] + ${CentShift}L) * 1000 - c[i])
           |      * ((u[i] + ${CentShift}L) * 1000 - c[i]))""".stripMargin))
      .select("vec_id", "d2_micro")
      .orderBy(col("d2_micro").desc, col("vec_id"))
      .limit(k)
  }

  /** `embeddings_exact_dups`: byte-identical vector audit — the
    * embedding twin of the multimodal exact manifest (#129): per
    * vector, the md5 checksum of its u3-quantized coordinates, the
    * group keeper (min vec_id over identical vectors) and the copy
    * flag. Exact vector duplicates are an ENCODER pathology (cache
    * collisions, truncated batches re-emitted, all-zero failure fills)
    * that cosine near-dup screens blur past — at τ < 1 they're just
    * "very similar", but a training pipeline wants them surfaced as
    * the infrastructure bug they are. Full-md5 checksum per the #129
    * collision discipline (a silent 60-bit merge here would fabricate
    * a pathology). One uniform checksum shuffle. */
  def exactDups(spark: SparkSession, dir: String): DataFrame = {
    val wC = org.apache.spark.sql.expressions.Window.partitionBy("checksum")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        md5(expr(s"""array_join(transform(embedding, x ->
          |  cast(cast(round(cast(x as double) * 1000) as bigint) as string)),
          |  ',')""".stripMargin)).as("checksum"))
      .withColumn("keep_vec", min("vec_id").over(wC))
      .select(col("vec_id"), col("checksum"), col("keep_vec"),
        (col("vec_id") =!= col("keep_vec")).as("is_copy"))
      .orderBy("vec_id")
  }

  /** #265 (lib): the FULL eigen-spectrum of the embedding covariance —
    * eigenvalues descending plus the orthonormal eigenvector matrix
    * (columns), by cyclic Jacobi rotation on the driver-side d×d
    * matrix built from [[covariance]]'s moment rows. Jacobi is the
    * right tool at this size: unconditionally convergent on symmetric
    * matrices, no shift heuristics, deterministic sweep order — the
    * spectrum is reproducible bit-for-bit across runs.
    *
    * The spectrum is what the collapse diagnostics read: effective
    * rank ([[effectiveRank]]), variance-explained curves, whitening
    * matrices. One distributed pass (the GramSumAgg scan) feeds all of
    * them. */
  def spectrum(spark: SparkSession, dir: String): (Array[Double], Array[Array[Double]]) =
    jacobiEigen(momentSnapshot(spark, dir)._3)

  /** ONE collected moment pass shared by every driver-side consumer:
    * (n, per-dim sums, exact covariance matrix). [[spectrum]] reads the
    * matrix; [[whiten]] additionally needs μ = s/n — which sits in the
    * very rows the matrix came from, so whitening costs exactly one
    * GramSumAgg job (spec-asserted), not two. */
  private def momentSnapshot(spark: SparkSession, dir: String)
      : (Double, Array[Double], Array[Array[Double]]) =
    momentRows(covariance(spark, dir))

  private def momentRows(covFrame: DataFrame)
      : (Double, Array[Double], Array[Array[Double]]) = {
    val d = Dim
    val rows = covFrame.collect()
    val cov = Array.ofDim[Double](d, d)
    val sums = Array.ofDim[Double](d)
    var n = 0.0
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val j = r.getLong(1).toInt
      n = r.getLong(2).toDouble
      if (i == j) sums(i) = r.getLong(3).toDouble
      val c = (n * r.getLong(5) - r.getLong(3).toDouble * r.getLong(4)) / (n * n)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    (n, sums, cov)
  }

  /** Whitening transform (lib): y = Wᵀ(x − μ) with W = V·diag(1/√λ)·Vᵀ
    * (ZCA whitening) computed from [[spectrum]]'s driver-side
    * eigendecomposition — the classic decorrelation step before
    * hyperplane LSH or quantization (correlated dimensions waste
    * hyperplanes; whitened space spends them evenly). Eigenvalues
    * below `eps`·λmax are clipped to the floor (their directions carry
    * no variance — dividing by √λ→0 would amplify noise unboundedly).
    *
    * Shape: the d×d matrix and the mean are DRIVER math off the one
    * GramSumAgg pass, then broadcast as plan literals into a single
    * narrow per-row map (one fused projection, no shuffle, no join) —
    * exactly how a production whitener ships: train once, apply as a
    * stateless column transform. Output in raw u3 units. */
  /** The (μ, W) pair [[whiten]] bakes into its projection — exposed so
    * the whitened-LSH oracle can embed the IDENTICAL driver-computed
    * doubles as SQL literals (one definition, two runtimes — the FS_CTES
    * discipline applied to a trained matrix). One GramSumAgg pass. */
  def whitenParams(spark: SparkSession, dir: String, eps: Double = 1e-6)
      : (Array[Double], Array[Array[Double]]) =
    whitenParamsFrom(momentSnapshot(spark, dir), eps)

  /** [[whitenParams]] trained on an arbitrary (…, e) frame — the
    * saved-index build path trains on the BUILD corpus only, then
    * freezes (μ, W) for every later append (the frozen-quantizer
    * discipline applied to the whitening transform). */
  def whitenParamsOf(v: DataFrame, eps: Double = 1e-6)
      : (Array[Double], Array[Array[Double]]) =
    whitenParamsFrom(momentRows(covarianceOf(v)), eps)

  private def whitenParamsFrom(
      snap: (Double, Array[Double], Array[Array[Double]]), eps: Double)
      : (Array[Double], Array[Array[Double]]) = {
    val d = Dim
    // one GramSumAgg job: eigen-decomposition AND μ off the same collect
    val (n, sums, cov) = snap
    val (eigs, v) = jacobiEigen(cov)
    val mu = sums.map(_ / n)
    val lmax = eigs.map(math.abs).max
    val inv = eigs.map(l => 1.0 / math.sqrt(math.max(l, eps * lmax)))
    // W = V diag(inv) Vt — symmetric d×d
    val w = Array.tabulate(d, d) { (r, c) =>
      var s = 0.0; var k = 0
      while (k < d) { s += v(r)(k) * inv(k) * v(c)(k); k += 1 }
      s
    }
    (mu, w)
  }

  def whiten(spark: SparkSession, dir: String,
             eps: Double = 1e-6): DataFrame = {
    val (mu, w) = whitenParams(spark, dir, eps)
    // fused kernel, not the transform×aggregate HOF chain: the nested
    // element_at-over-typedlit formulation is CodegenFallback and
    // measured ~75 ms PER ROW at d=64 — the ByteSimHash discipline
    // applied the day a consumer (whitened-hyperplane LSH) landed.
    // Arithmetic is term-for-term identical (same IEEE ops, same
    // left-to-right fold), oracle-pinned by ann_whitened_topk.
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 1000d)).as("u"))
      .select(col("vec_id"),
        graft.plans.VectorExpressions.whitenProject(
          col("u"), mu.toSeq, w.map(_.toSeq).toSeq).as("w"))
  }

  /** Participation-ratio effective rank (Σλ)²/Σλ² — how many
    * directions the corpus REALLY spans: d for isotropic spectra, → 1
    * as the embedding collapses onto one axis. The scalar a drift
    * monitor tracks per corpus snapshot. */
  def effectiveRank(eigs: Array[Double]): Double = {
    val pos = eigs.map(math.max(_, 0d))
    val s = pos.sum
    val s2 = pos.map(x => x * x).sum
    if (s2 == 0d) 0d else s * s / s2
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweeps of
    * (p,q) rotations in fixed row-major order until the off-diagonal
    * Frobenius mass falls under `tol` relative to the diagonal mass.
    * Returns (eigenvalues descending, eigenvectors as COLUMNS aligned
    * with them). Deterministic: fixed sweep order, no randomization. */
  def jacobiEigen(mIn: Array[Array[Double]], tol: Double = 1e-24,
                  maxSweeps: Int = 128): (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val a = Array.tabulate(d, d)((i, j) => mIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      s
    }
    def diagMass = {
      var s = 0.0
      for (i <- 0 until d) s += a(i)(i) * a(i)(i)
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offMass > tol * math.max(diagMass, 1e-300)) {
      for (p <- 0 until d; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (apq != 0.0) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          // equal diagonal (theta == 0): signum would yield t = 0 — an
          // identity rotation that never reduces the off-diagonal mass
          // (exactly duplicated feature channels produce this block);
          // the standard branch takes the 45° rotation t = 1 instead
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var k = 0
          while (k < d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
            k += 1
          }
          k = 0
          while (k < d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
            k += 1
          }
          k = 0
          while (k < d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
            k += 1
          }
        }
      }
      sweep += 1
    }
    // a silent non-converged return would feed wrong eigenvalues into
    // the whitening matrix — fail loudly instead (quadratic convergence
    // makes maxSweeps=128 unreachable for any real symmetric input)
    if (offMass > tol * math.max(diagMass, 1e-300))
      throw new IllegalStateException(
        s"Jacobi eigendecomposition did not converge in $maxSweeps sweeps " +
          s"(off-diagonal mass $offMass vs diagonal $diagMass, tol $tol)")
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigs = order.map(i => a(i)(i)).toArray
    val vecs = Array.tabulate(d, d)((r, cIdx) => v(r)(order(cIdx)))
    (eigs, vecs)
  }

  /** Power iteration on a symmetric PSD matrix with a deterministic
    * seeded start (md5 of the index — never orthogonal to the top
    * eigenvector in practice). `iters` caps the loop; convergence is
    * checked every 50 steps and iteration stops once the residual
    * ‖Σv − λv‖ drops under 1e-8·λ, an order tighter than the 1e-6·λ
    * the spec pins — linear convergence at rate λ2/λ1 means a narrow
    * spectral gap needs more steps than any fixed count, and the
    * check costs one extra matvec per 50. */
  def powerIterate(m: Array[Array[Double]], iters: Int): (Double, Array[Double]) = {
    val d = m.length
    var v = Array.tabulate(d) { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pc:$i".getBytes("UTF-8"))
      ((((md(0) & 0xffL) << 8) | (md(1) & 0xffL)).toDouble / 65535.0) + 0.5
    }
    def norm(x: Array[Double]) = math.sqrt(x.map(a => a * a).sum)
    def mul(x: Array[Double]) = Array.tabulate(d) { i =>
      var s = 0.0; var j = 0
      while (j < d) { s += m(i)(j) * x(j); j += 1 }
      s
    }
    def residual(x: Array[Double]): (Double, Double) = {
      val ax = mul(x)
      val lam = x.zip(ax).map { case (a, b) => a * b }.sum // Rayleigh
      val r = math.sqrt(x.indices.map(i => { val e = ax(i) - lam * x(i); e * e }).sum)
      (lam, r)
    }
    var k = 0
    var done = false
    while (k < iters && !done) {
      val w = mul(v)
      val nw = norm(w)
      require(nw > 0, "power iteration collapsed to the zero vector")
      v = w.map(_ / nw)
      k += 1
      if (k % 50 == 0) {
        val (lam, r) = residual(v)
        done = lam > 0 && r <= 1e-8 * lam
      }
    }
    val (lambda, _) = residual(v)
    (lambda, v)
  }
}
