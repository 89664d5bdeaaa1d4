package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** Streaming side of the declarative data-quality gate: the SAME
  * (name, predicate) checks that `operators.Quality.tableChecks` runs
  * over batch tables attach to a streaming frame as an `observe()`
  * metric — per-micro-batch violation counts ride the progress bus
  * (StreamingQueryListener / lastProgress.observedMetrics) with no
  * second aggregation branch in the query, and the check DEFINITIONS
  * cannot drift between the batch gate and the stream monitor.
  */
object StreamQuality {

  /** Default observation name. */
  val MetricName = "graft_dq"

  /** Attach violation counters for `checks` to a (streaming or batch)
    * frame. Read them from each StreamingQueryProgress's
    * `observedMetrics(name)` row, one column per check. */
  def observed(df: DataFrame, checks: Seq[(String, Column)],
               name: String = MetricName): DataFrame = {
    val aggs = graft.operators.Quality.violationAggs(checks)
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
