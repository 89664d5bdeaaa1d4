package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's graceful-exit runtime shape
  * (/root/reference/src/index.ts:16-101 `exitGracefully`): on any exit
  * path it (1) flips the health check to failing FIRST (so the
  * orchestrator stops routing new work), (2) closes the intake side
  * (consumer, cache reader), (3) FLUSHES the output producer before
  * closing it (no buffered forwarded message is lost), (4) closes the
  * client and the health server last — and every step is individually
  * failure-isolated: one close throwing never prevents the later steps.
  *
  * The Spark mapping: consumer/reader close → stop the intake-most
  * streaming queries first; producer flush → `processAllAvailable()`
  * (drain everything already ingested to the sink) before `stop()`;
  * client close → the SparkSession, which the CALLER owns (a library
  * must not stop a shared session — the hook takes an optional
  * `stopSession`). Health flip → whatever `setHealthOk` backs the
  * deployment's probe (`Observability.GraftStreamListener.isHealthy`
  * is the in-library signal).
  */
object Lifecycle {

  /** Run one shutdown step; never throw (the reference wraps every
    * step in its own try/catch and logs, index.ts:34-99). */
  private def step(log: String => Unit, what: String)(f: => Unit): Unit =
    try f catch {
      case e: Throwable =>
        log(s"Something went wrong when $what: ${e.getMessage}")
    }

  /** Stop streaming queries gracefully, intake-first.
    *
    * @param queries   queries in INTAKE→OUTPUT order (stop the
    *                  consumer-most first, exactly like the reference
    *                  closes consumer before producer)
    * @param setHealthOk flipped to false before anything else
    * @param drain     when true, each query `processAllAvailable()`s
    *                  before stopping — the producer-flush analog: work
    *                  already ingested reaches the sink
    * @param stopSession stop this session last (the client-close
    *                  analog) — pass only a session this pipeline owns
    */
  def stopGracefully(queries: Seq[StreamingQuery],
                     setHealthOk: Boolean => Unit = _ => (),
                     log: String => Unit = _ => (),
                     drain: Boolean = true,
                     stopSession: Option[SparkSession] = None): Unit = {
    step(log, "setting health checks to fail") { setHealthOk(false) }
    queries.foreach { q =>
      if (drain)
        step(log, s"flushing query ${q.name}") { q.processAllAvailable() }
      step(log, s"stopping query ${q.name}") { q.stop() }
    }
    stopSession.foreach { s =>
      step(log, "stopping the Spark session") { s.stop() }
    }
    log("Exit process")
  }

  /** Install [[stopGracefully]] as a JVM shutdown hook (the
    * reference's SIGINT/SIGTERM/uncaughtException handlers funnel into
    * the same exit path). Returns the hook so tests can run it
    * directly. */
  def installShutdownHook(queries: => Seq[StreamingQuery],
                          setHealthOk: Boolean => Unit = _ => (),
                          log: String => Unit = _ => ()): Thread = {
    val t = new Thread(() =>
      stopGracefully(queries, setHealthOk, log), "graft-graceful-exit")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }
}
