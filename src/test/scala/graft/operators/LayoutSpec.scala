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
}
