package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, size}
import org.apache.spark.sql.streaming.OutputMode

/** StreamBudget.admissionGate over the real sf0.001 documents feed:
  * prefix-batched streaming equals the batch greedy fold, quotas are
  * never exceeded, and first-fit keeps admitting past a rejection. */
class StreamBudgetSpec extends SparkSpec {

  private lazy val docs: IndexedSeq[StreamBudget.Doc] =
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
      .orderBy("doc_id").collect()
      .map(r => StreamBudget.Doc(r.getLong(0), r.getString(1), r.getLong(2)))
      .toIndexedSeq

  // tight enough that every source rejects something
  private lazy val quota: Map[String, Long] =
    docs.groupBy(_.source).view
      .mapValues(ds => ds.map(_.n_toks).sum / 2).toMap

  private def streamed(batches: Int): Seq[StreamBudget.Admit] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamBudget.Doc]
    val name = s"budget_${System.nanoTime()}"
    val q = StreamBudget.admissionGate(mem.toDS(), quota)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(math.max(1, docs.length / batches)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[StreamBudget.Admit].collect().toSeq
  }

  private def driverModel(): Seq[StreamBudget.Admit] =
    docs.groupBy(_.source).toSeq.flatMap { case (src, ds) =>
      val q = quota(src)
      var used = 0L
      ds.sortBy(_.doc_id).map { d =>
        val fits = used + d.n_toks <= q
        if (fits) used += d.n_toks
        StreamBudget.Admit(d.doc_id, src, d.n_toks, used, fits)
      }
    }

  test("prefix-batched streaming equals the batch fold and the driver model") {
    val want = driverModel().sortBy(_.doc_id)
    val got = streamed(batches = 7).sortBy(_.doc_id)
    assert(got == want)
    val batch = StreamBudget.batchAdmission(spark, docs, quota)
      .collect().toSeq.sortBy(_.doc_id)
    assert(batch == want)
    // the gate actually bites: every source rejected at least one doc
    val rejectedSources = got.filterNot(_.admitted).map(_.source).toSet
    assert(rejectedSources == quota.keySet)
  }

  test("no source ever exceeds its quota, in any batching") {
    Seq(1, 4, 11).foreach { b =>
      val got = streamed(b)
      got.groupBy(_.source).foreach { case (src, rows) =>
        val admitted = rows.filter(_.admitted).map(_.n_toks).sum
        assert(admitted <= quota(src))
        assert(rows.map(_.cum_toks).max == admitted) // counter == reality
      }
    }
  }

  test("first-fit: a rejection does not close the source") {
    val got = streamed(batches = 3)
    // some source admits a document with a doc_id AFTER its first
    // rejection (the leftover room is used, not abandoned)
    val lives = got.groupBy(_.source).exists { case (_, rows) =>
      val firstRej = rows.filterNot(_.admitted).map(_.doc_id).minOption
      firstRej.exists(fr => rows.exists(r => r.admitted && r.doc_id > fr))
    }
    assert(lives)
  }
}
