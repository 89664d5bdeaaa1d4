package graft

/** Dev-only: print a registered query's executed plan
  * (`runMain graft.PlanDump <query> [sfDir]`) — the inspection loop
  * behind PlanQualitySpec's pins. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)
    println(SparkEntry.queries(args(0))(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
