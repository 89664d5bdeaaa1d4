package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the corpus snapshot diff (`corpus_snapshot_diff`):
  * documents arrive as a stream of (doc_id, digest) observations and
  * every arrival is classified ONLINE against the last seen content —
  * `added` (first sight), `unchanged` (same digest again), `changed`
  * (digest moved). The batch panel's fourth class, `removed`, is
  * deliberately absent here: absence is not an event a stream can
  * observe — detecting removals needs a full-snapshot comparison, which
  * is exactly what the batch `Snapshot.snapshotDiffOf` pass is for (the
  * two operators read together as CDC + periodic reconciliation).
  *
  * State per doc_id: the last digest string — O(1), hash-partitioned on
  * doc_id exactly like the batch join. Within a micro-batch, rows of
  * one doc classify in arrival order (the same left-to-right fold the
  * batch side's deterministic derivation implies).
  */
object StreamSnapshot {

  /** One observed document version. */
  case class Doc(doc_id: Long, source: String, digest: String)

  /** One classified observation. */
  case class Change(doc_id: Long, source: String, change_class: String)

  def changes(docs: Dataset[Doc]): Dataset[Change] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.doc_id)
      .flatMapGroupsWithState[String, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var prev = state.getOption
          val out = rows.map { d =>
            val cls = prev match {
              case None                       => "added"
              case Some(dg) if dg == d.digest => "unchanged"
              case Some(_)                    => "changed"
            }
            prev = Some(d.digest)
            Change(d.doc_id, d.source, cls)
          }.toList
          prev.foreach(state.update)
          out.iterator
      }
  }
}
