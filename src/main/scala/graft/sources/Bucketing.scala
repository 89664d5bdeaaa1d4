package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing for co-located joins — the storage-level
  * scale lever the shuffle-per-operator designs in `operators` cannot
  * express: a fact table that is joined on the same key query after
  * query (events on user_id, documents on doc_id) should pay its
  * shuffle ONCE at write time. A pair of tables bucketed by the same
  * key into the same bucket count join with NO exchange on either side
  * — Spark matches the buckets 1:1 (asserted in BucketingSpec) — and a
  * `sortBy` at write time lets the sort-merge join skip the per-task
  * sort too.
  *
  * Datasource (non-Hive) bucketing: works on the in-memory catalog, no
  * metastore service needed; the table is external at `path`, so the
  * parquet lives where the pipeline owns storage.
  */
object Bucketing {

  /** Write `df` as an external bucketed + bucket-sorted parquet table.
    * `buckets` should be sized so one bucket of the LARGEST co-bucketed
    * table fits an executor's task comfortably (at 100 TB on ~1000
    * executors, thousands of buckets — bucket counts must MATCH across
    * co-joined tables, so fix it per key domain, not per table). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The bucketed table, bucket metadata intact (a plain
    * `spark.read.parquet(path)` would DROP the bucket spec and
    * re-shuffle on the next join — bucketing only survives through the
    * catalog). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
