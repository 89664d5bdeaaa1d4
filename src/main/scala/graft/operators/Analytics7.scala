package graft.operators

import graft.Tables
import graft.functions.Hashing.{dec, halfUpDiv}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The partsupp-family TPC-H tranche (q2/q11/q16/q20), adapted to the
  * test schema: this corpus has NO partsupp table (TESTDATA schema
  * contract), so the supplycost/availqty terms those queries read are
  * out of reach BY DATA CONTRACT. Each query substitutes the
  * OBSERVED supply relationship from lineitem facts — who actually
  * shipped which part, at what realized unit price, in what volume —
  * which is the same business question asked of the fact table
  * instead of the catalog table. Documented per query; same
  * discipline as Analytics/Analytics2 (decimal-exact money, integer
  * exact-rational comparisons — never float thresholds — broadcast
  * only the forever-bounded dims and selective part subsets, total
  * ORDER BY for the oracle).
  */
object Analytics7 {

  /** Exact integer micro-units (value × 10⁴) of a 4-dp decimal sum:
    * sum(dec(c)) is an exact DECIMAL(28,4); × 10⁴ makes it integral,
    * and the long cast is lossless. All threshold/min comparisons here
    * run on these longs, so ties and boundaries are bit-identical to
    * the DuckDB oracle's `CAST(SUM(CAST(c AS DECIMAL(18,4)))*10000 AS
    * BIGINT)` by construction. */
  private def sumU4(c: Column): Column =
    (sum(dec(c)) * lit(10000)).cast("long")

  /** Q2-style min-cost supplier: for each part of one type/size band,
    * the region supplier(s) shipping it at the lowest REALIZED unit
    * price (sum(extendedprice)/sum(quantity) over that supplier's
    * lines — the supplycost proxy this corpus affords; no partsupp by
    * data contract). unit_ppk is the exact HALF_UP rational ×10⁴
    * (ratio4 discipline), so the per-part min selection is integer-
    * exact — a float unit price would make boundary ties
    * engine-dependent.
    *
    * Shape: the selective part subset broadcasts onto the lineitem
    * scan (prunes first); nation/region broadcast onto supplier; ONE
    * corpus-sized shuffle (the (part, supplier) aggregate), then the
    * per-part min runs as a window over the already-co-partitioned
    * aggregate frame (no second shuffle — partitionBy is the groupBy
    * key prefix). O(parts-in-band × region-suppliers) output. */
  def q2(spark: SparkSession, dir: String, region: String = "EUROPE",
         ptype: String = "STANDARD", sizeLo: Int = 10, sizeHi: Int = 20): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === ptype && col("p_size").between(sizeLo, sizeHi))
      .select("p_partkey", "p_brand")
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
      .select("r_regionkey")
    val nat = Tables.nation(spark, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    val perPartSupp = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "n_name")
      .agg(sumU4(col("l_extendedprice")).as("ext_u"),
        sumU4(col("l_quantity")).as("qty_u"))
      .withColumn("unit_ppk", halfUpDiv(col("ext_u") * lit(10000L), col("qty_u")))
    val perPart = Window.partitionBy(col("p_partkey"))
    perPartSupp
      .withColumn("min_ppk", min(col("unit_ppk")).over(perPart))
      .filter(col("unit_ppk") === col("min_ppk"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        col("n_name"), (col("unit_ppk") / lit(10000.0)).as("unit_price"))
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Q11-style important stock: parts whose realized supply value from
    * one nation's suppliers (sum of extendedprice over that nation's
    * lines — the availqty×supplycost proxy; no partsupp by data
    * contract) exceeds `multiple ×` the MEAN per-part value. The
    * classic fixed `0.0001/SF` fraction needs the scale factor spelled
    * out per run; a mean-relative cut is scale-free — the part domain
    * grows with the corpus, the mean tracks it, and "important" keeps
    * meaning "well above typical". The threshold is ONE exact HALF_UP
    * int64 (`thr_u = halfUp(multiple · total_u / n_parts)`) and the
    * filter a pure long compare — a float `> 0.0001 × total` is a
    * boundary lottery across engines.
    *
    * Shape: nation broadcast onto supplier, the nation's supplier keys
    * onto lineitem; ONE per-part shuffle; (total, n) is a 1-row
    * aggregate crossJoined back (broadcast-literal composition).
    * O(parts) output, value-ranked. */
  def q11(spark: SparkSession, dir: String,
          nationName: String = "NATION_3", multiple: Int = 2): DataFrame = {
    val nat = Tables.nation(spark, dir).filter(col("n_name") === nationName)
      .select("n_nationkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sumU4(col("l_extendedprice")).as("value_u"))
    val thr = perPart.agg(
      halfUpDiv(sum(col("value_u")) * lit(multiple.toLong),
        greatest(count(lit(1)), lit(1L))).as("thr_u"))
    perPart.crossJoin(broadcast(thr))
      .filter(col("value_u") > col("thr_u"))
      .select(col("p_partkey"), (col("value_u") / lit(10000.0)).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q16-style part/supplier counts: distinct suppliers OBSERVED
    * shipping each surviving (brand, type, size) combination —
    * supplier-of-part read from lineitem facts (no partsupp by data
    * contract; the classic complaint-supplier exclusion reads a
    * comment column this corpus doesn't carry). Excludes one brand and
    * one type, keeps the classic 8-size panel.
    *
    * Shape: the filtered part dim broadcasts onto a distinct
    * (partkey, suppkey) pair scan; countDistinct per combination is
    * the only corpus-sized shuffle. O(brand × type × size) output. */
  def q16(spark: SparkSession, dir: String, excludeBrand: String = "Brand#13",
          excludeType: String = "PROMO",
          sizes: Seq[Int] = Seq(1, 9, 14, 19, 23, 36, 45, 49)): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
        col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q20-style dominant suppliers: region suppliers who shipped more
    * than thresholdPct% of some family part's total volume in one
    * year — the "holds the stock" signal q20 reads from
    * availqty > ½·yearly-demand, asked of realized shipments (no
    * partsupp by data contract). Dominance is integer-exact:
    * `qty_u × 100 > part_total_u × pct`.
    *
    * Shape: family part keys broadcast onto the year-filtered lineitem
    * scan; ONE (part, supplier) shuffle; the per-part total is a
    * window over the co-partitioned aggregate (partitionBy = groupBy
    * key prefix — no second shuffle); the surviving dominant pairs
    * (tiny) join the region supplier dim. O(region suppliers)
    * output. */
  def q20(spark: SparkSession, dir: String, family: String = "red",
          region: String = "EUROPE", year0: Int = 1996,
          thresholdPct: Int = 30): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith(family)).select("p_partkey")
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
      .select("r_regionkey")
    val nat = Tables.nation(spark, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val perPartSupp = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .filter(year(col("l_shipdate")) === year0)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(sumU4(col("l_quantity")).as("qty_u"))
    val perPart = Window.partitionBy(col("p_partkey"))
    perPartSupp
      .withColumn("part_total_u", sum(col("qty_u")).over(perPart))
      .filter(col("qty_u") * lit(100L) > col("part_total_u") * lit(thresholdPct.toLong))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .orderBy("s_suppkey")
  }
}
