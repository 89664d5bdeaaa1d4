package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent batch-append parquet sink — the general form of the
  * commit-marker protocol the streaming index maintenance uses
  * (StreamIndex): plain parquet plus a tiny commit log, readable by any
  * engine, safe to append to from retried jobs.
  *
  * Layout under `dir`:
  * {{{
  *   batch=<id>/part-*.parquet   -- one directory per appended batch
  *   _commits/<id>               -- empty marker, created AFTER the data
  * }}}
  *
  * Protocol:
  *  - `append(df, dir, id)` is IDEMPOTENT per id: a committed id is
  *    skipped outright; an uncommitted id (first attempt, or a crash
  *    that tore the data write before its marker landed) OVERWRITES the
  *    batch directory and then commits — so any number of retries of
  *    the same (id, data) leaves exactly one copy.
  *  - `read` unions COMMITTED batches only: a torn write without its
  *    marker is invisible, never half-read.
  *
  * This is deliberately the minimal transactional contract a 100 TB
  * append-only corpus needs (exactly-once per retried batch, atomic
  * visibility) without a table-format dependency: the marker directory
  * is O(batches) empty files, the data path is untouched parquet, and
  * readers list one small directory before planning the scan. What it
  * does NOT give — concurrent writers to the SAME batch id, row-level
  * deletes, schema evolution — is documented out of scope.
  */
object TxnParquet {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(dir: String, batchId: Long) =
    new Path(s"$dir/_commits/$batchId")

  /** Append `df` as batch `batchId`; returns true when this call wrote
    * (false = the id was already committed and the call was a no-op). */
  def append(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    if (f.exists(marker(dir, batchId))) false
    else {
      df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      f.create(marker(dir, batchId), true).close()
      true
    }
  }

  /** Batch ids with a commit marker, ascending. */
  def committedBatches(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val commits = new Path(s"$dir/_commits")
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).map(_.getPath.getName.toLong).sorted.toSeq
  }

  /** All committed rows (torn, uncommitted batch directories are never
    * read). One scan over the committed directories — the paths are
    * explicit, so a torn directory costs nothing at plan time either. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val ids = committedBatches(spark, dir)
    require(ids.nonEmpty, s"no committed batches under $dir")
    spark.read.parquet(ids.map(id => s"$dir/batch=$id"): _*)
  }
}
