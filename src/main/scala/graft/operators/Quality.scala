package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (the deequ/dbt-test shape): each
  * check compiles to an aggregate expression, so ALL checks on a table
  * evaluate in ONE scan; referential checks are anti-join counts
  * (broadcast when the parent side is small). The report is the
  * long-format (table, check, n_violations) frame a pipeline gates on.
  */
object Quality {

  /** One-pass aggregate checks over a table: each (name, predicate)
    * counts rows VIOLATING the predicate (a NULL predicate counts as a
    * violation; an empty table reports exact zeros). Check names are
    * caller-supplied identifiers and end up inside generated SQL, so
    * they are restricted to word characters — fail fast rather than
    * splice arbitrary text into an expression. */
  def tableChecks(df: DataFrame, table: String,
                  checks: Seq[(String, Column)]): DataFrame = {
    val aggs = violationAggs(checks)
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${checks.size}, " +
        checks.map { case (n, _) => s"'$n', $n" }.mkString(", ") +
        ") AS (check_name, n_violations)")
      .select(lit(table).as("table_name"), col("check_name"), col("n_violations"))
  }

  /** The violation-count aggregate expressions behind [[tableChecks]] —
    * also attachable to a STREAMING frame via `observe()`
    * (streaming.StreamQuality), so batch tables and micro-batches gate
    * on the one check definition. */
  def violationAggs(checks: Seq[(String, Column)]): Seq[Column] = {
    require(checks.nonEmpty, "at least one data-quality check is required")
    checks.map { case (name, pred) =>
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid check name: '$name'")
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(name)
    }
  }

  /** Uniqueness violation count: rows beyond the first per key. */
  def uniqueCheck(df: DataFrame, table: String, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("n_violations"))
      .select(lit(table).as("table_name"),
        lit(s"unique_$key").as("check_name"), col("n_violations"))

  /** Referential violation count: child keys with no parent (anti-join;
    * the parent side is key-projected and deduped, broadcast when
    * small). */
  def refCheck(child: DataFrame, table: String, childKey: String,
               parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(table).as("table_name"),
        lit(s"ref_${childKey}").as("check_name"), col("n_violations"))

  /** The standard report over the test schema: null/range gates on
    * events, uniqueness of the event id, and the TPC-H referential
    * spine (lineitem→orders→customer, supplier→nation). */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.eventsUs(spark, dir)
    tableChecks(ev, "events", Seq(
      "value_non_negative" -> (col("value") >= 0),
      "event_type_present" -> col("event_type").isNotNull,
      "props_present" -> col("props").isNotNull,
      "ts_in_epoch_range" -> (col("ts_us") > 0L)))
      .unionByName(uniqueCheck(ev, "events", "event_id"))
      .unionByName(refCheck(Tables.lineitem(spark, dir), "lineitem", "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"))
      .unionByName(refCheck(Tables.orders(spark, dir), "orders", "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .unionByName(refCheck(Tables.supplier(spark, dir), "supplier", "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy("table_name", "check_name")
  }
}
