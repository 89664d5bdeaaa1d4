package graft
// TEMPORARY dev probe (not committed): time the stages of the
// rolling-window panels at a given sf dir.
object Probe14 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.withDefaults(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    t("scan_only")(docs.count())
    val wins = graft.operators.DocDedup.rollingWindowsOf(docs.select("doc_id","text"), 8)
    t("wins_derive")(wins.count())
    t("wins_derive2")(wins.count())
    t("agg_firsts")(wins.groupBy("win_h").agg(count(lit(1)).as("c")).filter(col("c") > 1).count())
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy("win_h").orderBy("doc_id", "pos")
    t("sort_window_dups")(wins.withColumn("rn", row_number().over(byHash))
      .filter(col("rn") > 1).count())
    val wcp = wins.localCheckpoint()
    t("checkpointed_count")(wcp.count())
    val multi = wcp.groupBy("win_h")
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("pos"))).as("f"))
      .filter(col("c") > 1L)
    t("agg_join_dups")(wcp.join(multi, "win_h")
      .filter(col("doc_id") =!= col("f.doc_id") || col("pos") =!= col("f.pos")).count())
    spark.stop()
  }
}
