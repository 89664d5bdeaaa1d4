package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** StreamSnapshot.changes vs the batch snapshot diff on the SAME
  * deterministic v1/v2 derivation the registered query uses: streaming
  * v1 then v2 classifies every v2 arrival exactly as the batch panel
  * does (removed excluded — absence is not a stream event). */
class StreamSnapshotSpec extends SparkSpec {

  private def docsOf(df: org.apache.spark.sql.DataFrame): Seq[StreamSnapshot.Doc] =
    df.select(col("doc_id"), col("source"), md5(col("text")).as("dg"))
      .orderBy("doc_id").collect()
      .map(r => StreamSnapshot.Doc(r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("streamed v1→v2 arrivals reproduce the batch classes (minus removed)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = graft.Tables.documents(spark, sf).select("doc_id", "source", "text")
    val v1 = docsOf(base.filter(pmod(col("doc_id"), lit(3L)) =!= 0L))
    val v2 = docsOf(base.filter(pmod(col("doc_id"), lit(5L)) =!= 2L)
      .withColumn("text", when(pmod(col("doc_id"), lit(7L)) === 0L,
        concat(col("text"), lit(" v2"))).otherwise(col("text"))))

    val mem = MemoryStream[StreamSnapshot.Doc]
    val name = s"snap_${System.nanoTime()}"
    val q = StreamSnapshot.changes(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(v1); q.processAllAvailable()
      mem.addData(v2); q.processAllAvailable()
    } finally q.stop()

    // v2 arrivals only (skip the v1 warm-up sight of every doc)
    val v1Ids = v1.map(_.doc_id).toSet
    val got = spark.table(name).as[StreamSnapshot.Change].collect()
      .groupBy(_.doc_id).view.mapValues(_.toSeq).toMap
    val gotV2 = v2.map { d =>
      val sightings = got(d.doc_id)
      (d.doc_id, if (v1Ids.contains(d.doc_id)) sightings(1) else sightings.head)
    }.toMap
    val want = graft.operators.Snapshot.snapshotDiff(spark, sf).collect()
      .filter(_.getString(1) != "removed")
    // per-(source, class) totals match the batch panel exactly
    val gotCells = gotV2.values.groupBy(c => (c.source, c.change_class))
      .view.mapValues(_.size.toLong).toMap
    val wantCells = want.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotCells == wantCells)
  }
}
