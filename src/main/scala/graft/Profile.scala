package graft

import org.apache.spark.sql.functions._
import graft.operators.{DocDedup, MinHashLSH, TextAnalysis}

/** Dev-only: stage-level timing of the shingle-join operators. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32)
    time("warmup count") { Tables.documents(spark, dir).count() }
    val sh = DocDedup.docShingles(spark, dir)
    time("docShingles count") { sh.count() }
    time("docShingles count again") { sh.count() }
    val a = sh.as("a"); val b = sh.as("b")
    val pairs = a.join(b, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
    time("raw pair join count") { pairs.count() }
    val grouped = pairs.groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    time("grouped pairs count") { grouped.count() }
    time("full ngramJaccard") { DocDedup.ngramJaccard(spark, dir).count() }
    val bands = MinHashLSH.bandSignatures(sh)
    time("minhash band sigs") { bands.count() }
    time("full minhash") { MinHashLSH.nearDupPairs(spark, dir).count() }
    spark.stop()
  }
}
