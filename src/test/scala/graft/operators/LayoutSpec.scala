package graft.operators

import graft.SparkSpec

/** Z-order layout planner: the manifest partitions the table exactly,
  * and the clustering actually clusters — per-file envelopes must be
  * tight on BOTH interleaved dimensions (the measurable pruning win a
  * 1-D sort can't give). */
class LayoutSpec extends SparkSpec {

  test("manifest covers the table exactly across NumFiles files") {
    val m = Layout.zorderPlan(spark, sf).collect()
    assert(m.map(_.getLong(0)).toSeq == (0L until Layout.NumFiles).toSeq)
    val total = m.map(_.getLong(m.head.fieldIndex("n_rows"))).sum
    val n = graft.Tables.lineitem(spark, sf).count()
    assert(total == n, s"manifest rows $total != lineitem $n")
    // equal cut: file sizes differ by at most 1
    val sizes = m.map(_.getLong(m.head.fieldIndex("n_rows")))
    assert(sizes.max - sizes.min <= 1)
  }

  test("frozen z-range manifest routes appends without re-sorting") {
    import org.apache.spark.sql.functions._
    val ranges = Layout.zRangeManifest(spark, sf).collect()
      .sortBy(_.getLong(0))
    // ranges partition the whole z-space: start at 0, contiguous, end
    // at 2^20-1 — every future z lands in exactly one file
    assert(ranges.head.getLong(1) == 0L)
    assert(ranges.last.getLong(2) == (1L << (2 * Layout.ZBits)) - 1L)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(2) + 1L, s"gap after file ${a.getLong(0)}")
    case _ => ()
    }
    // routing the ORIGINAL rows through the frozen manifest reproduces
    // the planned file for all but boundary-tie rows (a z shared
    // across a rank-cut boundary routes wholly to the later file)
    val dom = Layout.domain(spark, sf)
    val manifest = Layout.zRangeManifest(spark, sf)
    val rows = Layout.zorderAssignments(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "file_id")
    val routed = Layout.assignToManifest(
      rows.drop("file_id"), manifest, dom)
    assert(routed.count() == rows.count()) // disjoint cover: no dup/loss
    val agree = routed.withColumnRenamed("file_id", "routed_file")
      .join(rows, Seq("l_orderkey", "l_linenumber"))
      .filter(col("routed_file") === col("file_id")).count()
    // the sf0.001 corpus has only ~2000 distinct z-values over 6000
    // rows, so nearly every rank-cut boundary splits a tie (~1 row per
    // boundary re-routes); at real scale z-values outnumber rows per
    // file and the disagreement vanishes
    assert(agree >= (rows.count() * 0.98).toLong,
      s"only $agree of ${rows.count()} rows reproduced their planned file")
    // an out-of-domain append clamps into the edge buckets and still
    // routes to exactly one file
    import spark.implicits._
    val wild = Seq((9999999L, 1, 99999999L, -5L)).toDF(
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    assert(Layout.assignToManifest(wild, manifest, dom).count() == 1L)
  }

  test("z-order envelopes are tight on BOTH dimensions") {
    val m = Layout.zorderPlan(spark, sf).collect()
    def meanShare(c: String) =
      m.map(r => r.getDouble(r.fieldIndex(c))).sum / m.length
    val (pk, sk) = (meanShare("pk_span_share4"), meanShare("sk_span_share4"))
    info(f"mean span share: pk=$pk%.3f sk=$sk%.3f")
    // 64 files over a 2-D interleave: expected per-dim span ≈ 1/√64;
    // arrival order would sit near 1.0 on both. Generous ceiling.
    assert(pk < 0.5, f"pk envelope $pk%.3f not clustered")
    assert(sk < 0.5, f"sk envelope $sk%.3f not clustered")
  }

  test("pruning gain: z-order touches a small file share, arrival touches all") {
    val rows = Layout.zorderPruningGain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === Layout.GainPcts.map(_.toLong))
    rows.foreach { case (pct, zf, zs, af, as_) =>
      assert(zf <= af, s"pct=$pct: z-order touched MORE files than arrival")
      assert(zs == ratio4Model(zf, Layout.NumFiles.toLong))
      assert(as_ == ratio4Model(af, Layout.NumFiles.toLong))
      // arrival-order files each span ~the whole uniform key domain
      assert(as_ >= 0.9, s"pct=$pct: arrival share $as_ unexpectedly prunable")
      assert(zs <= 0.5, s"pct=$pct: z-order share $zs not clustered")
    }
  }

  test("writeLayout installs the plan: parquet footers equal the manifest envelopes") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    val installed = Layout.writeLayout(spark, sf, out).collect()
      .sortBy(_.getLong(0))
    val planned = Layout.zorderPlan(spark, sf).collect().sortBy(_.getLong(0))
    // plan → files closed: the installed manifest IS the planned one
    assert(installed.map(_.toString).toSeq === planned.map(_.toString).toSeq)
    val conf = spark.sparkContext.hadoopConfiguration
    installed.foreach { r =>
      val dirPath = new org.apache.hadoop.fs.Path(s"$out/file_id=${r.getLong(0)}")
      val fsys = dirPath.getFileSystem(conf)
      val parts = fsys.listStatus(dirPath).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"file_id=${r.getLong(0)}: expected exactly one parquet file")
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(parts.head, conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        def stat(cn: String) = blocks.map(b =>
          b.getColumns.asScala.find(_.getPath.toDotString == cn).get.getStatistics)
        def lo(cn: String) =
          stat(cn).map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min
        def hi(cn: String) =
          stat(cn).map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max
        assert(blocks.map(_.getRowCount).sum === r.getLong(1))
        assert(lo("l_partkey") === r.getLong(2) && hi("l_partkey") === r.getLong(3))
        assert(lo("l_suppkey") === r.getLong(4) && hi("l_suppkey") === r.getLong(5))
      } finally rd.close()
    }
  }

  test("a 2-D predicate on the installed layout prunes most rows at the scan") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("zorderq").toString
    val manifest = Layout.writeLayout(spark, sf, out).collect()
    val total = manifest.map(_.getLong(1)).sum
    // query box = a middle file's envelope (both dimensions at once)
    val mid = manifest(manifest.length / 2)
    val (pLo, pHi, sLo, sHi) =
      (mid.getLong(2), mid.getLong(3), mid.getLong(4), mid.getLong(5))
    val q = spark.read.parquet(out)
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
    val expected = graft.Tables.lineitem(spark, sf)
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi)).count()
    assert(q.count() === expected) // the layout changed nothing semantically
    // the predicate reaches the parquet reader…
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_partkey"), plan.take(600))
    // …and row-group stats actually skip: rows surviving the scan are
    // bounded by the envelope-intersecting files, far below the table
    q.collect()
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value }.get
    val intersecting = manifest.filter(r =>
      r.getLong(2) <= pHi && r.getLong(3) >= pLo &&
        r.getLong(4) <= sHi && r.getLong(5) >= sLo).map(_.getLong(1)).sum
    info(s"scan output $scanned rows; envelope bound $intersecting; table $total")
    assert(scanned <= intersecting)
    assert(intersecting < total / 2, "z-order should prune most files for a 2-D box")
  }
}
