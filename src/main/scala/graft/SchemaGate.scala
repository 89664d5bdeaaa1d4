package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import scala.util.{Failure, Success, Try}

/** Up-front validation of the physical testdata contract (TESTDATA.md §schema).
  *
  * A silent regeneration of the driver's parquet (new column, dropped
  * column, or an unsupported timestamp encoding) should fail the round with
  * ONE clear message naming the table and the deviation — not as dozens of
  * opaque per-query analysis errors. Supported `events.ts` encodings are
  * whatever `Tables.tsUsCol` normalizes (int64 nanos, TIMESTAMP,
  * TIMESTAMP_NTZ); everything else is reported here.
  */
object SchemaGate {

  /** Required columns per table. Names only — the engine is deliberately
    * tolerant of physical type evolution where it can normalize (ts), and
    * extra columns are always fine (scans prune them). */
  val requiredColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                        "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "source", "lang", "text"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Returns a list of human-readable violations; empty = contract holds. */
  def check(spark: SparkSession, dir: String): Seq[String] =
    requiredColumns.toSeq.sortBy(_._1).flatMap { case (tbl, cols) =>
      Try(Tables.table(spark, dir, tbl).schema) match {
        case Failure(e) =>
          Seq(s"table '$tbl' unreadable at $dir: ${e.getMessage.linesIterator.next()}")
        case Success(schema) =>
          val missing = cols.filterNot(schema.fieldNames.contains)
          val tsBad =
            if (tbl == "events" && !missing.contains("ts"))
              schema("ts").dataType match {
                case LongType | TimestampType | TimestampNTZType => Nil
                case other => Seq(
                  s"events.ts has unsupported physical type ${other.simpleString} " +
                    "(supported: int64 nanos, timestamp, timestamp_ntz — see Tables.tsUsCol)")
              }
            else Nil
          missing.map(c => s"table '$tbl' missing required column '$c'") ++ tsBad
      }
    }

  /** Prints violations loudly; returns true when the contract holds. */
  def report(spark: SparkSession, dir: String): Boolean = {
    val violations = check(spark, dir)
    violations.foreach(v => System.err.println(s"[schema-gate] $v"))
    if (violations.nonEmpty)
      System.err.println(
        s"[schema-gate] testdata at $dir deviates from TESTDATA.md contract " +
          s"(${violations.size} violation(s)) — downstream query failures likely share this root cause")
    violations.isEmpty
  }
}
