package graft.operators

import graft.Tables
import graft.functions.Hashing.{dec, money2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second tranche of TPC-H-style analytics, adapted to the test schema
  * (no partsupp/phone/date columns beyond what the tables carry). Same
  * discipline as Analytics: decimal-exact money, hint-broadcast only the
  * forever-bounded dims (nation/region), total ORDER BY for the oracle.
  */
object Analytics2 {

  private val one = lit(1.0).cast(DecimalType(18, 4))
  private def discPrice = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))

  /** Q7-style volume shipping between two nations: revenue of goods a
    * supplier in one nation ships to a customer in the other, per year
    * and direction. Both nation dims broadcast onto the fact join. */
  def q7(spark: SparkSession, dir: String,
         nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      .filter(col("n_name").isin(nationA, nationB))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
        col("s_nationkey") === col("n_nationkey")).drop("n_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat.withColumnRenamed("n_name", "cust_nation")),
        col("c_nationkey") === col("n_nationkey")).drop("n_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(money2(sum(discPrice)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q9-style product revenue: disc-price revenue per (supplier
    * nation, order year) for one product family (p_name substring
    * filter — the q9 LIKE '%green%' move on this corpus's color-named
    * parts). The corpus has NO partsupp table (TESTDATA schema
    * contract), so q9's ps_supplycost term is out of reach BY DATA
    * CONTRACT and the panel reports the revenue half of profit —
    * documented, not approximated.
    *
    * Shape: the filtered part key set broadcasts onto the lineitem
    * scan (the selective filter prunes FIRST, so only family rows
    * reach the supplier/orders joins); nation broadcasts onto
    * supplier; output is O(nations × years). */
  def q9(spark: SparkSession, dir: String, family: String = "red"): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains(family)).select("p_partkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_partkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(money2(sum(discPrice)).as("revenue"))
      .orderBy("nation", "o_year")
  }

  /** Q8-style market share: one nation's share of a region's revenue
    * for one part type, per order year (q14's conditional-ratio shape
    * over the q5 join graph). */
  def q8(spark: SparkSession, dir: String, region: String = "ASIA",
         nation: String = "NATION_1", pType: String = "ECONOMY"): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
    val nat = Tables.nation(spark, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    val part = Tables.part(spark, dir).filter(col("p_type") === pType).select("p_partkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        money2(sum(when(col("n_name") === nation, discPrice)
          .otherwise(lit(0.0).cast(DecimalType(18, 4))))).as("nation_revenue"),
        money2(sum(discPrice)).as("total_revenue"),
        round(sum(when(col("n_name") === nation, discPrice)
            .otherwise(lit(0.0).cast(DecimalType(18, 4)))).cast("double")
          / sum(discPrice).cast("double"), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q13-style customer order-count distribution: how many customers
    * placed k orders (left join keeps zero-order customers). */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15-style top supplier: supplier(s) achieving the maximum quarterly
    * revenue — the classic "aggregate, take the max, keep the argmax
    * rows" shape, done with one window over the revenue aggregate. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(money2(sum(discPrice)).as("total_revenue"))
    // max via a window over the (small, per-supplier) aggregate — NOT a
    // second aggregation subtree, which would scan lineitem twice; the
    // single-partition window only ever sees |suppliers| rows.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val top = rev.withColumn("mx", max("total_revenue").over(wAll))
      .filter(col("total_revenue") === col("mx"))
    top.join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"), "s_suppkey")
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Q17-style small-quantity revenue: line items below 20% of their
    * part's average quantity — the correlated-aggregate shape, planned
    * as a per-part aggregate joined back onto the fact table. The
    * threshold is an exact-decimal mean rounded once, so the comparison
    * boundary is bit-identical across engines. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val avgQty = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4)
        .as("avg_qty"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(avgQty, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 4)
          .as("avg_yearly"))
  }

  /** Q18-style large-volume orders: orders whose total quantity exceeds
    * the threshold, with their customer — aggregate-then-semi-join. */
  def q18(spark: SparkSession, dir: String, minQty: Double = 200.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(money2(sum(dec(col("l_quantity")))).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("l_orderkey").as("o_orderkey"),
        money2(dec(col("o_totalprice"))).as("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** Q19-style disjunctive predicate revenue: OR-of-ANDs across the
    * part join — the pushdown/branch-pruning stress shape. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(10, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(20, 35) &&
          col("l_quantity").between(20, 40)))
      .agg(money2(sum(discPrice)).as("revenue"))
  }

  /** Q22-style idle wealthy customers: above-average balance, no RECENT
    * orders (the classic "lapsed customer" window), grouped by nation —
    * scalar subquery + anti-join. */
  def q22(spark: SparkSession, dir: String,
          sinceDate: String = "1999-01-01"): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey", "c_acctbal")
    // exact decimal sum → one double division, rounded: the threshold is
    // bit-identical across engines (DuckDB's AVG over decimal is double)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(round(sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)), 4).as("a"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
           money2(sum(dec(col("c_acctbal")))).as("totacctbal"))
      .orderBy("c_nationkey")
  }
}
