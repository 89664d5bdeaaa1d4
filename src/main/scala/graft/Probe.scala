package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe. Two modes:
  *   runMain graft.Probe                      — schema dump of the test tables
  *   runMain graft.Probe <sfDir> <query...>   — time the named queries
  *     (two runs each, like Bench) at the given SF dir on local[ncpus]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.length >= 2) { time(args.head, args.tail); return }
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "documents", "embeddings", "orders")) {
      val df = Tables.table(spark, dir, t)
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }

  private def time(sfDir: String, names: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = GraftSession.withDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm-up
    catch { case _: Throwable => () }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: best=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
