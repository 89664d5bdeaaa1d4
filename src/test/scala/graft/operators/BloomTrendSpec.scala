package graft.operators

import graft.SparkSpec

/** Round-13 wave-12 panels vs independent in-memory models at sf0.001:
  * dedup_bloom_accuracy (salted-position Bloom filter replayed in
  * driver Scala over the engine's digest stream) and events_trend_ols
  * (BigInt OLS over the raw collected events).
  */
class BloomTrendSpec extends SparkSpec {

  private def h64Model(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def halfUp(num: Long, den: Long): Long = (num + den / 2) / den

  test("bloomAccuracy: every count matches a driver-Scala Bloom replay; FN provably zero") {
    val cutoff = Dedup.BootstrapCutoffUs
    val dg = Dedup.hashedStream(spark, sf)
      .select("digest", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, rows) =>
        (d, rows.exists(_._2 < cutoff), rows.exists(_._2 >= cutoff))
      }.toSeq
    val build = dg.collect { case (d, true, _) => d }.toSet
    val probes = dg.collect { case (d, pre, true) => (d, pre) }
    def pos(m: Int, i: Int, d: Long): Long =
      h64Model(s"bloom:$m:$i:$d") % m
    val expected = Sketches.BloomConfigs.map { case (m, k) =>
      val set = build.flatMap(d => (0 until k).map(i => pos(m, i, d)))
      val hit = probes.map { case (d, pre) =>
        (pre, (0 until k).forall(i => set.contains(pos(m, i, d))))
      }
      val nFp = hit.count { case (pre, positive) => !pre && positive }.toLong
      val nNon = hit.count(!_._1).toLong
      (m, k, build.size.toLong, halfUp(set.size.toLong * 1000000L, m),
        probes.size.toLong, hit.count(_._1).toLong,
        hit.count { case (pre, positive) => pre && !positive }.toLong,
        nNon, nFp, halfUp(nFp * 1000000L, math.max(nNon, 1L)))
    }.sortBy(_._1)
    val got = Sketches.bloomAccuracy(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    assert(got == expected)
    // the structural guarantee the panel releases: a Bloom filter can
    // never false-negative, at ANY config
    assert(got.forall(_._7 == 0L))
    // more slots -> sparser filter (fill ratio strictly decreases)
    assert(got.map(_._4) == got.map(_._4).sortBy(-_))
  }

  test("trendOls: slope/intercept/r2 match a BigInt OLS over the raw events") {
    val ev = Dedup.eventsUs(spark, sf)
      .select("event_type", "ts_us", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L,
        math.round(r.getDouble(2) * 100)))
    val day0 = ev.map(_._2).min
    val expected = ev.groupBy(_._1).toSeq.map { case (t, rows) =>
      val daily = rows.groupBy(_._2).toSeq
        .map { case (d, rs) => (BigInt(d - day0), BigInt(rs.map(_._3).sum)) }
      val n = BigInt(daily.size)
      val sx = daily.map(_._1).sum
      val sxx = daily.map(p => p._1 * p._1).sum
      val sy = daily.map(_._2).sum
      val sxy = daily.map(p => p._1 * p._2).sum
      val syy = daily.map(p => p._2 * p._2).sum
      val sn = n * sxy - sx * sy
      val sd = n * sxx - sx * sx
      val iin = sy * sxx - sx * sxy
      val syyN = n * syy - sy * sy
      def signed4(num: BigInt): Option[Double] =
        if (sd == 0) None
        else Some(num.signum * (((num.abs * 10000 + sd / 2) / sd).toLong / 10000.0))
      val r2 = if (sd == 0 || syyN == 0) None
        else Some(((2 * sn * sn * 1000000 + sd * syyN) / (2 * sd * syyN)).toLong)
      (t, n.toLong, sy.toLong, signed4(sn), signed4(iin), r2)
    }.sortBy(_._1)
    val got = Analytics6.trendOls(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == expected)
    // r² lives on the ppm grid
    assert(got.forall(_._6.forall(v => v >= 0L && v <= 1000000L)))
  }
}
