package graft.operators

import graft.Partitioning._
import graft.Tables
import graft.functions.Hashing.{intDiv, ratio4}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order data-layout planning — the write-side clustering that makes
  * 100 TB scans prunable. A table laid out in arrival order answers a
  * two-dimensional predicate (`part X AND supplier Y`) by reading every
  * file; interleaving the two key dimensions' bucket bits into one sort
  * key (Morton order) and cutting the sorted order into equal files
  * gives every file a TIGHT min/max envelope on BOTH dimensions at
  * once — the footer stats any parquet reader already prunes by.
  *
  * The planner is deliberately a PLAN, not a rewrite: it emits the
  * per-file skipping manifest (file id → row count + per-dimension
  * min/max + span shares) a writer commits to, and the span-share
  * columns grade the layout (span_share ≈ 1/√files per dimension for a
  * 2-D z-order vs ≈ 1 for arrival order — the measurable pruning win).
  *
  * Scale shape: one O(1)-row domain aggregate (broadcast), one narrow
  * bucket/interleave pass (pure per-row integer bit math, no shuffle),
  * ONE range-partitioned global rank (the native GlobalRank pass — no
  * single-partition window), one O(rows)→O(files) rollup. The sort that
  * a real rewrite would pay is exactly the rank pass; nothing else
  * widens at 100×.
  */
object Layout {

  /** Bits per dimension: 1024 buckets — z-values fit 20 bits. */
  val ZBits = 10

  /** Output file count for the plan (a real writer derives this from
    * target file bytes; the panel pins it for determinism). */
  val NumFiles = 64

  /** Equi-width bucket of `v` in the CLOSED domain [lo, hi] — exact
    * int64 math: (v − lo) · 2^bits div (hi − lo + 1) ∈ [0, 2^bits).
    * Equi-width (not rank-based) keeps the pass shuffle-free; a skewed
    * dimension would swap in the quantile machinery lineitem_quantiles
    * already has. */
  private def bucket(v: Column, lo: Column, hi: Column): Column =
    intDiv((v - lo) * lit(1L << ZBits), hi - lo + lit(1L))

  /** Morton interleave of two [[ZBits]]-bit buckets: b1's bits land at
    * odd positions, b2's at even — bit i of b1 → bit 2i+1 of z. */
  private def zInterleave(b1: Column, b2: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Generic z-value of two numeric dimension columns under domain
    * bounds riding the frame (broadcast 1-row aggregate): values are
    * clamped into the domain (late rows outside a frozen domain land
    * in the edge buckets), bucketed equi-width, Morton-interleaved.
    * The reusable kernel behind the lineitem planner AND the z-ordered
    * compaction rewrite (TxnParquet.compactZOrdered). */
  def zValue(c1: Column, lo1: Column, hi1: Column,
             c2: Column, lo2: Column, hi2: Column): Column =
    zInterleave(
      bucket(greatest(lo1, least(hi1, c1)), lo1, hi1),
      bucket(greatest(lo2, least(hi2, c2)), lo2, hi2))

  /** The clustered dimensions' domain row — the frozen-quantizer state
    * of a committed layout (persist it with the manifest; re-deriving
    * from data + appends would re-bucket every existing file). */
  def domain(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").spread
      .agg(
        min("l_partkey").as("pk_lo"), max("l_partkey").as("pk_hi"),
        min("l_suppkey").as("sk_lo"), max("l_suppkey").as("sk_hi"),
        count(lit(1)).as("n"))

  /** The per-row assignment [[zorderPlan]] summarizes — what a writer
    * actually consumes (`repartitionByRange` on file_id, or
    * write.partitionBy): row keys + z-value + target file. */
  def zorderAssignments(spark: SparkSession, dir: String,
                        nFiles: Int = NumFiles): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").spread
    val z = li.crossJoin(broadcast(domain(spark, dir)))
      .withColumn("b1", bucket(col("l_partkey"), col("pk_lo"), col("pk_hi")))
      .withColumn("b2", bucket(col("l_suppkey"), col("sk_lo"), col("sk_hi")))
      .withColumn("z", zInterleave(col("b1"), col("b2")))
    Ranking.globalRowNumber(z,
        Seq(col("z"), col("l_orderkey"), col("l_linenumber")), "rn")
      .withColumn("file_id", intDiv((col("rn") - 1) * nFiles, col("n")))
  }

  /** Incremental twin of the planner: route NEW rows to the files of
    * an EXISTING manifest without re-sorting the table — the append
    * path a z-ordered 100 TB table actually runs between periodic
    * re-layouts. Each new row recomputes its z-value under the
    * manifest's FROZEN domain (the [lo, hi] and file z-boundaries are
    * quantizer state, exactly like the ANN families' frozen models:
    * re-deriving them from data+appends would re-shuffle every
    * existing file) and lands in the file whose z-range contains it —
    * a broadcast range join against O(files) boundaries, no global
    * sort, no shuffle of existing data. Drift (appends outside the
    * frozen domain clamp into the edge buckets; envelopes widen) is
    * what the span-share columns of a re-run [[zorderPlan]] surface —
    * the re-layout trigger. */
  def assignToManifest(newRows: DataFrame, manifest: DataFrame,
                       dom: DataFrame): DataFrame = {
    val bounds = manifest.select(col("file_id"), col("z_lo"), col("z_hi"))
    newRows.crossJoin(broadcast(dom))
      .withColumn("b1", bucket(
        greatest(col("pk_lo"), least(col("pk_hi"), col("l_partkey"))),
        col("pk_lo"), col("pk_hi")))
      .withColumn("b2", bucket(
        greatest(col("sk_lo"), least(col("sk_hi"), col("l_suppkey"))),
        col("sk_lo"), col("sk_hi")))
      .withColumn("z", zInterleave(col("b1"), col("b2")))
      .join(broadcast(bounds),
        col("z") >= col("z_lo") && col("z") <= col("z_hi"))
      .select((newRows.columns.map(col) :+ col("z") :+ col("file_id")): _*)
  }

  /** The frozen-quantizer form of the manifest [[assignToManifest]]
    * consumes: per file, the COVERING z-range (z_lo = this file's min
    * z, z_hi = next file's min z − 1; the last file extends to the max
    * z-value) — ranges partition the z-space, so every future z lands
    * in exactly one file. */
  def zRangeManifest(spark: SparkSession, dir: String,
                     nFiles: Int = NumFiles): DataFrame = {
    val za = zorderAssignments(spark, dir, nFiles)
    val perFile = za.groupBy("file_id").agg(min("z").as("z_min"))
    val w = Window.orderBy("file_id") // O(files) rows
    perFile
      .withColumn("z_lo",
        when(col("file_id") === 0L, lit(0L)).otherwise(col("z_min")))
      .withColumn("z_hi",
        coalesce(lead(col("z_min"), 1).over(w) - 1L,
          lit((1L << (2 * ZBits)) - 1L)))
      .select("file_id", "z_lo", "z_hi")
  }

  /** `pipeline_zorder_plan`: the O(files) skipping manifest — per
    * target file: rows, min/max envelope of both clustered dimensions,
    * and each envelope's share of its dimension's domain (ratio4; the
    * self-grading column — z-order holds it near 1/√files, arrival
    * order near 1). */
  def zorderPlan(spark: SparkSession, dir: String,
                 nFiles: Int = NumFiles): DataFrame =
    planOf(zorderAssignments(spark, dir, nFiles))

  /** Physically INSTALL the plan — the write-side half the planner
    * promises: each planned file's rows land as one parquet file under
    * `outDir/file_id=<id>/`, sorted by z within the file, so the
    * parquet FOOTER min/max of both clustered dimensions equal the
    * manifest envelopes and any reader's pushed predicate skips
    * non-intersecting files (row groups). Returns the manifest
    * MEASURED FROM THE INSTALLED FILES (one narrow read-back scan) —
    * identical to [[zorderPlan]] when the install preserved the
    * assignment, which LayoutSpec pins.
    *
    * Scale shape: the assignment pass (domain broadcast + bit math +
    * ONE native global rank) feeds one hash exchange on file_id (each
    * id lives in exactly one task, so `partitionBy` emits exactly one
    * file per id) and a per-partition sort; the manifest read-back is
    * a narrow O(rows)→O(files) rollup over the freshly written files.
    * Nothing re-sorts and no driver materialization anywhere. */
  def writeLayout(spark: SparkSession, dir: String, outDir: String,
                  nFiles: Int = NumFiles): DataFrame = {
    zorderAssignments(spark, dir, nFiles)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("z"), col("file_id"))
      .repartition(nFiles, col("file_id"))
      .sortWithinPartitions("file_id", "z", "l_orderkey", "l_linenumber")
      .write.mode("overwrite").partitionBy("file_id").parquet(outDir)
    planOf(spark.read.parquet(outDir)
      .crossJoin(broadcast(domain(spark, dir))))
  }

  /** Box-size percents probed by [[zorderPruningGain]]. */
  val GainPcts: Seq[Int] = Seq(1, 5, 10, 25)

  /** `zorder_pruning_gain`: the panel that turns the planner's span
    * shares into the number an operator actually cares about — for a
    * centered 2-D box predicate of side pct% of each dimension's
    * domain, HOW MANY FILES does a footer-stats reader touch under
    * the z-order layout vs the same row count cut in ARRIVAL order?
    * Per pct: files whose envelope intersects the box (exact int64
    * box arithmetic), as count and ratio4 share, for both layouts —
    * z-order should touch a near-constant small share while arrival
    * order touches ~every file (each arrival file spans the whole
    * key domain). Cost: the two assignment passes (each ONE global
    * rank) → two O(files) envelope rollups → constant-size box
    * probes; nothing new widens at scale. */
  def zorderPruningGain(spark: SparkSession, dir: String,
                        nFiles: Int = NumFiles,
                        pcts: Seq[Int] = GainPcts): DataFrame = {
    def touched(m: DataFrame, outCol: String): DataFrame =
      m.withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
        .withColumn("h1",
          intDiv((col("pk_hi") - col("pk_lo") + 1) * col("pct"), lit(200L)))
        .withColumn("h2",
          intDiv((col("sk_hi") - col("sk_lo") + 1) * col("pct"), lit(200L)))
        .withColumn("c1", intDiv(col("pk_lo") + col("pk_hi"), lit(2L)))
        .withColumn("c2", intDiv(col("sk_lo") + col("sk_hi"), lit(2L)))
        .filter(
          col("pk_min") <= col("c1") + col("h1") &&
          col("pk_max") >= col("c1") - col("h1") &&
          col("sk_min") <= col("c2") + col("h2") &&
          col("sk_max") >= col("c2") - col("h2"))
        .groupBy("pct").agg(count(lit(1)).as(outCol))
    val z = touched(envelopes(zorderAssignments(spark, dir, nFiles)), "z_files")
    val a = touched(envelopes(arrivalAssignments(spark, dir, nFiles)),
      "arrival_files")
    domain(spark, dir)
      .select(explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .join(broadcast(z), Seq("pct"), "left")
      .join(broadcast(a), Seq("pct"), "left")
      .select(col("pct"),
        coalesce(col("z_files"), lit(0L)).as("z_files"),
        ratio4(coalesce(col("z_files"), lit(0L)), lit(nFiles.toLong))
          .as("z_share4"),
        coalesce(col("arrival_files"), lit(0L)).as("arrival_files"),
        ratio4(coalesce(col("arrival_files"), lit(0L)), lit(nFiles.toLong))
          .as("arrival_share4"))
      .orderBy("pct")
  }

  /** The same keys cut into `nFiles` equal files in ARRIVAL order
    * ((l_orderkey, l_linenumber)) — the un-clustered baseline the
    * pruning-gain panel compares against. */
  private def arrivalAssignments(spark: SparkSession, dir: String,
                                 nFiles: Int): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").spread
      .crossJoin(broadcast(domain(spark, dir)))
    Ranking.globalRowNumber(li,
        Seq(col("l_orderkey"), col("l_linenumber")), "rn")
      .withColumn("file_id", intDiv((col("rn") - 1) * nFiles, col("n")))
  }

  /** O(files) envelope rollup (no shares) shared by the gain panel. */
  private def envelopes(za: DataFrame): DataFrame =
    za.groupBy("file_id").agg(
      count(lit(1)).as("n_rows"),
      min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
      min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"),
      min("pk_lo").as("pk_lo"), min("pk_hi").as("pk_hi"),
      min("sk_lo").as("sk_lo"), min("sk_hi").as("sk_hi"))

  /** The O(files) manifest rollup over any assignment-shaped frame
    * (rows carrying file_id, both dimension columns, and the broadcast
    * domain constants). */
  private def planOf(za: DataFrame): DataFrame =
    za.withColumn("file_id", col("file_id").cast("long"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
        min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"),
        // the domain rides every row (broadcast join output) — min is
        // just "the constant", keeping the rollup one pass
        min("pk_lo").as("pk_lo"), min("pk_hi").as("pk_hi"),
        min("sk_lo").as("sk_lo"), min("sk_hi").as("sk_hi"))
      .select(col("file_id"), col("n_rows"),
        col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
        ratio4(col("pk_max") - col("pk_min") + 1,
          col("pk_hi") - col("pk_lo") + 1).as("pk_span_share4"),
        ratio4(col("sk_max") - col("sk_min") + 1,
          col("sk_hi") - col("sk_lo") + 1).as("sk_span_share4"))
      .orderBy("file_id")
}
