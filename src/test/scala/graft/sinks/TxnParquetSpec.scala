package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

/** TxnParquet commit-marker protocol: idempotent retries, torn-write
  * invisibility, multi-batch union. */
class TxnParquetSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("txnparquet").toString

  test("append is idempotent per batch id") {
    val dir = freshDir()
    val b = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(TxnParquet.append(b, dir, 0L))
    assert(!TxnParquet.append(b, dir, 0L)) // retry skips
    assert(!TxnParquet.append(b, dir, 0L))
    assert(TxnParquet.read(spark, dir).count() == 2L)
  }

  test("a torn write (data without marker) is invisible until recommitted") {
    val dir = freshDir()
    TxnParquet.append(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    // crash simulation: batch data lands but the marker never does
    Seq((9L, "torn")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    assert(TxnParquet.committedBatches(spark, dir) == Seq(0L))
    assert(TxnParquet.read(spark, dir).count() == 1L)
    // the retry overwrites the torn directory and commits exactly once
    assert(TxnParquet.append(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir, 1L))
    assert(TxnParquet.committedBatches(spark, dir) == Seq(0L, 1L))
    val rows = TxnParquet.read(spark, dir).as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c"))) // torn row gone
  }

  test("read unions all committed batches") {
    val dir = freshDir()
    (0L to 4L).foreach(i => TxnParquet.append(Seq((i, s"v$i")).toDF("id", "v"), dir, i))
    val rows = TxnParquet.read(spark, dir).as[(Long, String)].collect().toSet
    assert(rows == (0L to 4L).map(i => (i, s"v$i")).toSet)
    intercept[IllegalArgumentException](TxnParquet.read(spark, freshDir()))
  }
}
