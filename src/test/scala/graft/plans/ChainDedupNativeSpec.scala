package graft.plans

import graft.SparkSpec
import graft.operators.Dedup

class ChainDedupNativeSpec extends SparkSpec {

  test("native chain operator equals the mapPartitions formulation") {
    val hashed = Dedup.hashedStream(spark, sf)
    val native = Dedup.chainNative(hashed).collect().map(_.getAs[Long]("event_id")).toSet
    val mp = Dedup.chain(hashed).collect().map(_.getAs[Long]("event_id")).toSet
    assert(native === mp)
  }

  test("native chain plan contains ChainDedupExec and no object ser/de") {
    val df = Dedup.chainNative(Dedup.hashedStream(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ChainDedup"))
    assert(!plan.contains("SerializeFromObject"))
  }
}
