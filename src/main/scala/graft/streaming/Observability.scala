package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the Spark-native analog of the reference's
  * ops surface:
  *
  *  - per-minute forwarded/dropped counters running IN the stream
  *    (deduplication.ts:82-94) → StreamDedup.minuteCounters /
  *    StreamDedup.observed;
  *  - the health check server (healthCheck.ts:1-32, "am I still
  *    processing?") → `GraftStreamListener.isHealthy`: a query is
  *    healthy while progress events keep arriving within a timeout AND
  *    it has not terminated — the reference flips unhealthy the moment
  *    the consumer closes, not a timeout later.
  *
  * The listener aggregates the observed per-batch metrics into
  * cumulative totals per query name, so an operator dashboard (or a
  * test) can read forwarded/dropped without touching the query's own
  * output sink. Totals stay readable after termination (post-mortem);
  * entries live for the listener's lifetime — one per query name.
  */
object Observability {

  /** Name of the observation attached by StreamDedup.observed. */
  val MetricName = "graft_dedup"

  final case class QueryStats(lastProgressMs: Long,
                              batches: Long,
                              forwarded: Long,
                              dropped: Long,
                              terminated: Boolean = false)

  /** Register with `spark.streams.addListener(new GraftStreamListener)`. */
  class GraftStreamListener extends StreamingQueryListener {
    private val stats = new ConcurrentHashMap[String, QueryStats]()
    // termination events carry only ids — remember each query's name
    private val idToName = new ConcurrentHashMap[String, String]()

    private def nameFor(id: String, name: String): String = {
      val n = Option(name).getOrElse(id)
      idToName.put(id, n)
      n
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
      val name = nameFor(e.id.toString, e.name)
      stats.put(name, QueryStats(System.currentTimeMillis(), 0L, 0L, 0L))
    }

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val name = nameFor(e.progress.id.toString, e.progress.name)
      val prev = Option(stats.get(name)).getOrElse(QueryStats(0L, 0L, 0L, 0L))
      val (df, dd) = Option(e.progress.observedMetrics.get(MetricName)) match {
        case Some(row) if !row.isNullAt(0) => (row.getLong(0), row.getLong(1))
        case _ => (0L, 0L)
      }
      stats.put(name, QueryStats(
        System.currentTimeMillis(), prev.batches + 1,
        prev.forwarded + df, prev.dropped + dd, prev.terminated))
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val name = Option(idToName.get(e.id.toString)).getOrElse(e.id.toString)
      Option(stats.get(name)).foreach(s => stats.put(name, s.copy(terminated = true)))
    }

    /** Cumulative observed totals for a query name. */
    def totals(name: String): Option[QueryStats] = Option(stats.get(name))

    /** healthCheck.ts analog: healthy while the query keeps making
      * progress within `timeoutMs` of now and has not terminated. */
    def isHealthy(name: String, timeoutMs: Long): Boolean =
      Option(stats.get(name)).exists(s =>
        !s.terminated &&
        System.currentTimeMillis() - s.lastProgressMs <= timeoutMs)
  }
}
