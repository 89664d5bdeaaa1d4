package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming funnel progression: a per-user state machine tracking
  * view → click-after-view → purchase-after-click, with O(1) state per
  * user (current stage + the timestamp that reached it).
  *
  * Assumes per-user event-time-ordered delivery (the standard funnel
  * state-machine contract — enforce upstream with a watermark +
  * sort within the micro-batch if the bus reorders); under it the
  * final stages equal the batch funnel's stage sets exactly
  * (StreamFunnelSpec). Stages are monotone, so the latest update per
  * user is the answer in update output mode. */
object StreamFunnel {

  case class Ev(user_id: Long, ts_us: Long, event_type: String)
  case class St(stage: Int, lastTs: Long)
  case class Out(user_id: Long, stage: Int)

  private def step(s: St, e: Ev): St = e.event_type match {
    case "view" if s.stage == 0 => St(1, e.ts_us)
    case "click" if s.stage == 1 && e.ts_us > s.lastTs => St(2, e.ts_us)
    case "purchase" if s.stage == 2 && e.ts_us > s.lastTs => St(3, e.ts_us)
    case _ => s
  }

  def funnelStages(ev: Dataset[Ev]): Dataset[Out] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Out]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[St, Out](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state) =>
          var s = state.getOption.getOrElse(St(0, Long.MinValue))
          // order within the micro-batch; cross-batch order is the
          // caller's delivery contract
          rows.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach(e => s = step(s, e))
          state.update(s)
          Out(uid, s.stage)
      }
  }
}
