package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalAgg fold == from-scratch aggregate, in any batch order,
  * with retractions as exact inverses, over real events at sf0.001. */
class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("event_type")
  private def cents = round(col("value") * 100).cast("long")

  private lazy val ev = Dedup.eventsUs(spark, sf)
    .select("event_id", "event_type", "value").localCheckpoint()

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("append fold over thirds equals the batch aggregate") {
    val parts = (0 to 2).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      IncrementalAgg.batchAggregate(ev, keys, cents).schema)
    val folded = parts.foldLeft(empty)(
      (st, b) => IncrementalAgg.applyAppend(st, b, keys, cents).localCheckpoint())
    assert(asMap(folded) == asMap(IncrementalAgg.batchAggregate(ev, keys, cents)))
    // batch-order invariance
    val foldedRev = parts.reverse.foldLeft(empty)(
      (st, b) => IncrementalAgg.applyAppend(st, b, keys, cents).localCheckpoint())
    assert(asMap(foldedRev) == asMap(folded))
  }

  test("retract is the exact inverse of append") {
    val a = ev.filter(pmod(col("event_id"), lit(3)) === 0)
    val b = ev.filter(pmod(col("event_id"), lit(3)) =!= 0)
    val all = IncrementalAgg.batchAggregate(ev, keys, cents)
    val afterRetract = IncrementalAgg.applyRetract(all, b, keys, cents)
    assert(asMap(afterRetract) == asMap(IncrementalAgg.batchAggregate(a, keys, cents)))
    // retracting everything empties the state (zero rows dropped)
    assert(IncrementalAgg.applyRetract(all, ev, keys, cents).count() == 0L)
  }
}
