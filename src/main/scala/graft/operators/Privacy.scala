package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-risk panels over the event stream.
  *
  * The reference's payloads carry rider-level fields the operator must
  * treat as personal data (reference README's GDPR note; the scrubbed
  * `text_scrub` / `docs_pii_prevalence` panels cover free text). This
  * module covers the STRUCTURED side: how re-identifiable are event rows
  * from their quasi-identifiers alone — the k-anonymity lens a release
  * reviewer applies before exporting an events extract.
  */
object Privacy {

  /** Quasi-identifier grain: (event_type, UTC day, $10 spend band).
    * Day and band are exact integer arithmetic on the canonical µs
    * timestamp / cent value, so the class key is engine-independent. */
  val SpendBandCents = 1000L
  val UsPerDay = 86400000000L

  /** k-histogram buckets: (rank, label, exclusive upper bound on k). */
  val KBuckets: Seq[(Long, String, Long)] = Seq(
    (1L, "k=1", 2L), (2L, "k=2-4", 5L), (3L, "k=5-9", 10L),
    (4L, "k=10-19", 20L))

  /** #199 `privacy_k_anonymity`: k-anonymity risk histogram for an
    * events extract under the (event_type, day, spend-band)
    * quasi-identifier. Every row lands in an equivalence class of size
    * k (rows sharing its QI triple); the panel buckets classes by k
    * and reports, per bucket, how many classes and rows sit there and
    * the exact ratio4 row share plus cumulative share — the "what
    * fraction of rows are in classes smaller than k" curve a
    * release-gate policy (suppress k<5, say) reads directly.
    *
    * Shape: one narrow scan → one groupBy on the QI triple (the only
    * corpus-sized shuffle, uniform keys) → O(classes) k-bucket rollup
    * (partial-aggregable) → cumulative window over the O(5) bucket
    * rows. Scale: class count ≤ types × days × bands — effectively
    * bounded; no skew (day and band split hot event types). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymityOf(Dedup.eventsUs(spark, dir))

  /** [[kAnonymity]] over any canonical events frame (ts_us µs). */
  def kAnonymityOf(ev: DataFrame): DataFrame = {
    import graft.functions.Hashing.{intDiv, ratio4}
    val classes = ev
      .select(col("event_type"),
        intDiv(col("ts_us"), lit(UsPerDay)).as("day"),
        intDiv(round(col("value") * 100).cast("long"), lit(SpendBandCents))
          .as("band"))
      .groupBy("event_type", "day", "band")
      .agg(count(lit(1)).as("k"))
    val bucketRank = KBuckets.reverse.foldLeft(
      lit(KBuckets.length + 1L)) { case (acc, (r, _, ub)) =>
        when(col("k") < ub, lit(r)).otherwise(acc)
      }
    val labelOf = KBuckets.map { case (r, l, _) => (r, l) } :+
      ((KBuckets.length + 1L, "k>=20"))
    val labelCol = labelOf.reverse.foldLeft(lit("k>=20"): Column) {
      case (acc, (r, l)) => when(col("bucket_rank") === r, lit(l)).otherwise(acc)
    }
    val cells = classes
      .withColumn("bucket_rank", bucketRank)
      .groupBy("bucket_rank")
      .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"))
      .localCheckpoint()
    val tot = cells.agg(sum("n_rows").as("t"))
    val w = Window.orderBy("bucket_rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(tot))
      .withColumn("cum_rows", sum("n_rows").over(w))
      .select(col("bucket_rank"), labelCol.as("bucket"),
        col("n_classes"), col("n_rows"),
        ratio4(col("n_rows"), col("t")).as("row_share"),
        ratio4(col("cum_rows"), col("t")).as("cum_share"))
      .orderBy("bucket_rank")
  }
}
