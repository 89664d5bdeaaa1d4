package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MsgGenSourceSpec extends SparkSpec {

  private def gen(rows: Int, dupEvery: Int, partitions: Int) =
    spark.read.format("graft-msggen")
      .option("rows", rows).option("dupEvery", dupEvery)
      .option("partitions", partitions).load()

  test("generates the envelope schema with the requested cardinality") {
    val df = gen(9999, 3, 8)
    assert(df.schema.fieldNames.toSeq === Envelope.schema.fieldNames.toSeq)
    assert(df.count() === 9999)
    assert(df.rdd.getNumPartitions === 8)
  }

  test("planted duplicates have known cardinality after dedup") {
    // dupEvery=5 ≠ the default, so a dropped option can't false-pass
    val df = gen(10000, 5, 8)
    val deduped = Envelope.firstOccurrence(df)
    // every group of 5 consecutive ids shares one content → 2000 kept
    assert(deduped.count() === 2000)
  }

  test("generation is deterministic across partition layouts") {
    val a = gen(1000, 3, 2).select(Envelope.digest().as("d"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = gen(1000, 3, 16).select(Envelope.digest().as("d"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }
}
