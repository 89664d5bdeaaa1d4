package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("meta: byte length matches the document text length (ASCII corpus)") {
    val bad = Multimodal.meta(spark, sf).as("m")
      .join(graft.Tables.documents(spark, sf).as("d"), col("m.doc_id") === col("d.doc_id"))
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(bad === 0)
  }

  test("exactDedup keeps the min doc per byte-identical payload group") {
    import spark.implicits._
    // planted duplicates: 1 and 3 share bytes, 2 unique, 4 dups 1 again
    val assets = Seq(
      (1L, "abc"), (2L, "xyz"), (3L, "abc"), (4L, "abc"))
      .toDF("doc_id", "s")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.col("s"), "UTF-8").as("payload"))
    val got = Multimodal.exactDedupOf(assets).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got == Seq((1L, 3L, 1L, false), (2L, 3L, 2L, false),
      (3L, 3L, 1L, true), (4L, 3L, 1L, true)))
    // corpus manifest agrees with a text-grouping model
    val texts = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val keep = texts.groupBy(_._2).values
      .flatMap(g => g.map(d => d._1 -> g.map(_._1).min)).toMap
    val corpus = Multimodal.exactDedup(spark, sf).collect()
    assert(corpus.length == texts.length)
    corpus.foreach { r =>
      assert(r.getLong(3) == keep(r.getLong(0)))
      assert(r.getBoolean(4) == (r.getLong(0) != keep(r.getLong(0))))
    }
  }

  test("dedupSavings equals a driver model over the byte-identical groups") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keep = docs.groupBy(_._3).values
      .flatMap(g => g.map(d => d._1 -> g.map(_._1).min)).toMap
    val want = docs.groupBy(_._2).map { case (src, g) =>
      val total = g.map(_._3.getBytes("UTF-8").length.toLong).sum
      val dups = g.filter(d => keep(d._1) != d._1)
      val dupBytes = dups.map(_._3.getBytes("UTF-8").length.toLong).sum
      val den = math.max(total, 1L)
      src -> (g.length.toLong, total, dups.length.toLong, dupBytes,
        ((dupBytes * 10000 + den / 2) / den) / 10000.0)
    }
    val got = Multimodal.dedupSavings(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val w = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)) == w, s"source ${r.getString(0)}")
    }
  }

  test("decode: one deterministic asset per doc, stable across runs") {
    val a = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    val b = Multimodal.decode(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.length === graft.Tables.documents(spark, sf).count())
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getAs[Boolean]("ok"))
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
    }
  }

  test("embedStub output feeds the similarity operators end-to-end") {
    val emb = Multimodal.embedStub(spark, sf)
    assert(emb.count() === graft.Tables.documents(spark, sf).count())
    // vectors are deterministic and 64-wide
    val a = emb.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = Multimodal.embedStub(spark, sf).orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(a.map(_.sum).toSeq === b.map(_.sum).toSeq)
    assert(a.forall(_.length === 64))
    // compose with the native cosine expression: self-similarity = 1
    val self = emb.limit(5)
      .withColumn("cos", graft.plans.VectorExpressions.cosineSimilarity(col("embedding"), col("embedding")))
      .collect().map(_.getAs[Double]("cos"))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("sampleFrames fans out only video assets with stride steps") {
    val decoded = Multimodal.decode(spark, sf)
    val frames = Multimodal.sampleFrames(decoded, stride = 30)
    val vids = decoded.filter(col("format") === "mp4").count()
    assert(frames.select("doc_id").distinct().count() === vids)
    assert(frames.filter(col("frame_idx") % 30 =!= 0).count() === 0)
  }

  test("resizeStub shrinks payloads deterministically with audit columns") {
    val a = Multimodal.resizeStub(spark, sf, factor = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    val b = Multimodal.resizeStub(spark, sf, factor = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "stub kernel must be deterministic")
    a.foreach { case (_, nIn, nOut, payload) =>
      assert(nOut == (nIn + 3) / 4)
      assert(payload.length.toLong == nOut)
    }
    // in-to-out byte accounting survives an aggregation (audit query)
    val total = Multimodal.resizeStub(spark, sf, factor = 4)
      .agg(sum("n_bytes_in"), sum("n_bytes_out")).collect().head
    assert(total.getLong(1) <= total.getLong(0))
  }

  test("phash near-dup: small byte edits pair, unrelated payloads don't") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val edited = base.updated(200, 'X').updated(400, 'Y') // 2-byte edit
    val other = ("completely different payload content entirely " * 20).trim
    val assets = Seq(
      (1L, base), (2L, edited), (3L, other), (4L, base) // 4 = exact copy
    ).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val pairs = Multimodal.nearDupPairsOf(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 4L)).contains(0L), "exact copy must pair at hd=0")
    assert(pairs.contains((1L, 2L)), "2-byte edit must survive as near-dup")
    assert(pairs((1L, 2L)) <= SimHash.HammingMax)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated payloads must not pair")
  }
}
