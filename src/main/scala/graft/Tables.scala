package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Each loader is a plain parquet scan: projection and predicates applied
  * downstream are pushed into the scan by Catalyst, so these helpers stay
  * schema-free on purpose (`ReadSchema` in `.explain` shows the pruning).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `ts` as epoch microseconds, whatever the file's physical encoding.
    *
    * The engine must not hard-code one parquet timestamp representation of
    * its input: generators have shipped `events.ts` as TIMESTAMP(NANOS)
    * (surfacing as int64 nanos under `spark.sql.legacy.parquet.nanosAsLong`,
    * GraftSession) and TIMESTAMP(MICROS) with and without UTC adjustment
    * (TimestampType / TimestampNTZType — identical epoch math under the
    * session's pinned UTC zone). Branching on the
    * read schema keeps every consumer encoding-agnostic; the DuckDB oracle
    * side (`epoch_us(ts)`) already is.
    */
  def tsUsCol(df: DataFrame, column: String = "ts"): Column =
    df.schema(column).dataType match {
      case LongType =>
        // int64 nanos → µs by FLOOR division ((n - pmod) is an exact
        // multiple of 1000, so the truncating `div` equals floor even for
        // pre-epoch negatives — matching DuckDB's floor-based epoch_us).
        // The name is backtick-quoted so any legal column name parses.
        val q = "`" + column.replace("`", "``") + "`"
        expr(s"($q - pmod($q, 1000)) div 1000")
      case TimestampType => unix_micros(col(column))
      // unix_micros only accepts TIMESTAMP; the cast is a wall-clock
      // reinterpretation under the session's pinned UTC zone (GraftSession).
      case TimestampNTZType => unix_micros(col(column).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported physical type for event timestamp column '$column': ${other.simpleString}")
    }
}
