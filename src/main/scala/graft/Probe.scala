package graft

/** Dev-only probe: schema/compat checks on the test tables. */
object Probe {
  def main(args: Array[String]): Unit = {
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
}
