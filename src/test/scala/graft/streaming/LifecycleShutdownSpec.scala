package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Lifecycle.stopGracefully — the index.ts exitGracefully contract:
  * health flips first, intake stops before output, buffered work is
  * flushed to the sink before stop, and a throwing step never prevents
  * the later ones. */
class LifecycleShutdownSpec extends SparkSpec {

  test("health flips first, queries stop intake-first, flush precedes stop") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = scala.collection.mutable.ArrayBuffer[String]()
    val intake = MemoryStream[Long]
    val output = MemoryStream[Long]
    def start(mem: MemoryStream[Long], name: String) =
      mem.toDS().writeStream.format("memory")
        .queryName(s"${name}_${System.nanoTime()}")
        .outputMode(OutputMode.Append).start()
    val qIn = start(intake, "intake")
    val qOut = start(output, "output")
    // un-drained rows: only a flush-before-stop delivers them
    intake.addData(1L, 2L); output.addData(3L)

    Lifecycle.stopGracefully(
      Seq(qIn, qOut),
      setHealthOk = ok => events += s"health=$ok",
      log = m => events += m)

    assert(events.head == "health=false", events.mkString("; "))
    assert(events.last == "Exit process")
    assert(!qIn.isActive && !qOut.isActive)
    // drained: the pre-stop rows reached the sinks
    assert(spark.table(qIn.name).count() == 2L)
    assert(spark.table(qOut.name).count() == 1L)
  }

  test("a throwing step is isolated; later steps still run") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = scala.collection.mutable.ArrayBuffer[String]()
    val mem = MemoryStream[Long]
    val q = mem.toDS().writeStream.format("memory")
      .queryName(s"iso_${System.nanoTime()}")
      .outputMode(OutputMode.Append).start()

    Lifecycle.stopGracefully(
      Seq(q),
      setHealthOk = _ => sys.error("probe backend down"),
      log = m => events += m,
      drain = false)

    assert(events.exists(_.contains(
      "Something went wrong when setting health checks to fail")))
    assert(!q.isActive, "query must stop even though the health step threw")
    assert(events.last == "Exit process")
  }
}
