package graft

/** GraftConfig mirrors config.ts: same defaults, same validation
  * failures, and the parsed values drive the dedup operators. */
class ConfigSpec extends SparkSpec {

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("defaults match the reference") {
    val d = GraftConfig.deduplication(spark)
    assert(d.windowSeconds == 3600.0 && d.ignoredProperties.isEmpty)
    assert(d.windowUs == graft.operators.Dedup.WindowUs)
    val c = GraftConfig.cacheRebuild(spark)
    assert(c.cacheWindowSeconds == 172800.0 && !c.disableRebuild && c.warmupEnabled)
    assert(c.cacheWindowUs == graft.operators.Dedup.CacheWindowUs)
  }

  test("windows parse fractional seconds; invalid values fail startup") {
    withConf(GraftConfig.DedupWindowKey -> "1.5") {
      assert(GraftConfig.deduplication(spark).windowUs == 1500000L)
    }
    for (bad <- Seq("-1", "NaN", "Infinity", "soon"))
      withConf(GraftConfig.DedupWindowKey -> bad) {
        intercept[IllegalArgumentException](GraftConfig.deduplication(spark))
      }
    // parseFloat semantics (config.ts:71): leading whitespace skipped,
    // trailing garbage ignored, hex reads its leading "0"
    withConf(GraftConfig.DedupWindowKey -> " 1.5s") {
      assert(GraftConfig.deduplication(spark).windowUs == 1500000L)
    }
    withConf(GraftConfig.DedupWindowKey -> "0x1p3") {
      assert(GraftConfig.deduplication(spark).windowSeconds == 0.0)
    }
  }

  test("ignored properties: JSON string array only, like the reference") {
    withConf(GraftConfig.IgnoredPropsKey -> """["k", "mqttTopic"]""") {
      assert(GraftConfig.deduplication(spark).ignoredProperties == Seq("k", "mqttTopic"))
    }
    for (bad <- Seq("not json", """{"k":1}""", """["a", 3]""", "42"))
      withConf(GraftConfig.IgnoredPropsKey -> bad) {
        intercept[IllegalArgumentException](GraftConfig.deduplication(spark))
      }
  }

  test("cacheWindow <= 0 and the disable toggle both turn warm-up off") {
    withConf(GraftConfig.CacheWindowKey -> "0") {
      assert(!GraftConfig.cacheRebuild(spark).warmupEnabled)
    }
    withConf(GraftConfig.DisableRebuildKey -> "true") {
      assert(!GraftConfig.cacheRebuild(spark).warmupEnabled)
    }
    withConf(GraftConfig.DisableRebuildKey -> "yes") {
      intercept[IllegalArgumentException](GraftConfig.cacheRebuild(spark))
    }
  }

  test("client defaults match the reference (no oauth2, TLS on, ZSTD, block)") {
    val c = GraftConfig.client(spark)
    assert(c.oauth2.isEmpty && c.tlsValidateHostname &&
      c.compressionType == "ZSTD" && c.blockIfQueueFull)
  }

  test("oauth2 keys are all-or-none, like the reference (config.ts:147-158)") {
    withConf(GraftConfig.Oauth2IssuerUrlKey -> "https://issuer.example",
             GraftConfig.Oauth2KeyPathKey -> "/etc/key.json",
             GraftConfig.Oauth2AudienceKey -> "broker") {
      val o = GraftConfig.client(spark).oauth2.get
      assert(o.issuerUrl == "https://issuer.example" &&
        o.keyPath == "/etc/key.json" && o.audience == "broker" &&
        o.grantType == "client_credentials")
    }
    // any strict subset (or a JS-falsy empty string) fails startup
    withConf(GraftConfig.Oauth2IssuerUrlKey -> "https://issuer.example") {
      intercept[IllegalArgumentException](GraftConfig.client(spark))
    }
    withConf(GraftConfig.Oauth2IssuerUrlKey -> "https://issuer.example",
             GraftConfig.Oauth2KeyPathKey -> "",
             GraftConfig.Oauth2AudienceKey -> "broker") {
      intercept[IllegalArgumentException](GraftConfig.client(spark))
    }
  }

  test("compression type grammar: Zlib|LZ4|ZSTD|SNAPPY, case-sensitive") {
    for (ok <- Seq("Zlib", "LZ4", "ZSTD", "SNAPPY"))
      withConf(GraftConfig.CompressionTypeKey -> ok) {
        assert(GraftConfig.client(spark).compressionType == ok)
      }
    for (bad <- Seq("zstd", "GZIP", "none"))
      withConf(GraftConfig.CompressionTypeKey -> bad) {
        intercept[IllegalArgumentException](GraftConfig.client(spark))
      }
  }

  test("tls/blockIfQueueFull booleans use the reference's strict grammar") {
    withConf(GraftConfig.TlsValidateHostnameKey -> "false") {
      assert(!GraftConfig.client(spark).tlsValidateHostname)
    }
    withConf(GraftConfig.BlockIfQueueFullKey -> "false") {
      assert(!GraftConfig.client(spark).blockIfQueueFull)
    }
    for (bad <- Seq("True", "1", "yes"))
      withConf(GraftConfig.TlsValidateHostnameKey -> bad) {
        intercept[IllegalArgumentException](GraftConfig.client(spark))
      }
  }

  test("configured dedup applies the ignored-property set and TTL window") {
    withConf(GraftConfig.IgnoredPropsKey -> """["k"]""",
             GraftConfig.DedupWindowKey -> "7200") {
      val got = GraftConfig.configuredDedup(spark, sf).collect().map(_.getLong(0)).toSeq
      val want = graft.operators.Dedup.chainNative(
        graft.operators.Dedup.hashedStream(spark, sf, Seq("k")),
        7200L * 1000000L).collect().map(_.getLong(0)).toSeq
      assert(got == want)
    }
  }
}
