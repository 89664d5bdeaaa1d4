package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: same key, same bucket count → the join
  * plans with NO exchange on either side, and values are unchanged. */
class BucketingSpec extends SparkSpec {

  test("two tables bucketed on the join key join with zero exchanges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val users = graft.operators.Dedup.eventsUs(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val spend = graft.operators.Dedup.eventsUs(spark, sf)
      .groupBy("user_id")
      .agg(sum(graft.functions.Hashing.valueCents(col("value"))).as("cents"))
    Bucketing.writeBucketed(users, "b_users", s"$dir/users", "user_id", 8)
    Bucketing.writeBucketed(spend, "b_spend", s"$dir/spend", "user_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: broadcast would mask the bucket win
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "b_users")
        .join(Bucketing.table(spark, "b_spend"), "user_id")
      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // same values as the direct (shuffled) join
      val direct = users.join(spend, "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = joined
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_users")
      spark.sql("DROP TABLE IF EXISTS b_spend")
    }
  }

  test("reading the path directly drops the bucket spec (documented trap)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets2").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketed(df, "b_trap", s"$dir/t", "k", 4)
    try {
      // through the catalog: bucketed files (one per bucket per task)
      assert(Bucketing.table(spark, "b_trap").collect().length == 2)
      // path read still sees the same DATA (bucketing is layout, not
      // content) — but carries no bucket metadata for the planner
      val raw = spark.read.parquet(s"$dir/t")
      assert(raw.collect().length == 2)
    } finally spark.sql("DROP TABLE IF EXISTS b_trap")
  }
}
