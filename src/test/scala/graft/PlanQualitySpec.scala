package graft

/** Guards the plan properties PLANS.md documents — a regression that
  * loses pushdown, broadcast, or rank-pushdown should fail loudly. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate predicate is pushed into the parquet scan") {
    assert(plan("q1_agg").contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("q3: order-by-limit plans as TakeOrderedAndProject over broadcast joins") {
    val p = plan("q3_shipping")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("dedup_first: rank pushdown (WindowGroupLimit) below the digest exchange") {
    assert(plan("dedup_first").contains("WindowGroupLimit"))
  }

  test("q1: scan reads only the needed columns") {
    val p = plan("q1_agg")
    assert(p.contains("ReadSchema: struct<l_quantity:double"))
    assert(!p.contains("l_orderkey"))
  }
}
