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
  *    healthy while progress events keep arriving within a timeout.
  *
  * The listener aggregates the observed per-batch metrics into
  * cumulative totals per query name, so an operator dashboard (or a
  * test) can read forwarded/dropped without touching the query's own
  * output sink.
  */
object Observability {

  /** Name of the observation attached by StreamDedup.observed. */
  val MetricName = "graft_dedup"

  final case class QueryStats(lastProgressMs: Long,
                              batches: Long,
                              forwarded: Long,
                              dropped: Long)

  /** Register with `spark.streams.addListener(new GraftStreamListener)`. */
  class GraftStreamListener extends StreamingQueryListener {
    private val stats = new ConcurrentHashMap[String, QueryStats]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
      val name = Option(e.name).getOrElse(e.id.toString)
      stats.put(name, QueryStats(System.currentTimeMillis(), 0L, 0L, 0L))
    }

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      val prev = Option(stats.get(name))
        .getOrElse(QueryStats(0L, 0L, 0L, 0L))
      val (df, dd) = Option(e.progress.observedMetrics.get(MetricName)) match {
        case Some(row) if !row.isNullAt(0) =>
          (row.getLong(0), row.getLong(1))
        case _ => (0L, 0L)
      }
      stats.put(name, QueryStats(
        System.currentTimeMillis(), prev.batches + 1,
        prev.forwarded + df, prev.dropped + dd))
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    /** Cumulative observed totals for a query name. */
    def totals(name: String): Option[QueryStats] = Option(stats.get(name))

    /** healthCheck.ts analog: healthy while the query keeps making
      * progress within `timeoutMs` of now. */
    def isHealthy(name: String, timeoutMs: Long): Boolean =
      Option(stats.get(name))
        .exists(s => System.currentTimeMillis() - s.lastProgressMs <= timeoutMs)
  }
}
