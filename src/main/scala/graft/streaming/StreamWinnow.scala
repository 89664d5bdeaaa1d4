package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming winnowing co-occurrence — the online half of
  * `dedup_winnowing`: documents arrive with their fingerprint sets
  * (the SAME [[graft.operators.DocDedup.winnowFingerprintsOf]]
  * definition batch uses) and the gate maintains, per fingerprint
  * hash, the documents seen so far. A new document at a LIVE hash
  * emits one co-occurrence fragment per resident document; the
  * arrival that pushes a hash past the df cap emits a DEAD marker
  * instead — the tombstone that tells the consumer to discard every
  * fragment of that hash, because the batch semantics drop
  * boilerplate hashes by their FINAL document frequency, which a
  * stream cannot know in advance (the same emit-then-tombstone
  * resolution StreamDeletes uses for CDC).
  *
  * State per hash: the resident doc list, bounded at maxDf+1 (the +1
  * remembers deadness); hash-partitioned, so hot fingerprints shard
  * across executors. [[pairsFromFragments]] applies the tombstones
  * and thresholds — after ANY prefix batching, its output equals the
  * batch `winnowingPairs` (the parity the spec pins).
  */
object StreamWinnow {

  /** One document fingerprint (producer grain). */
  case class Fp(doc_id: Long, h: Long)

  /** Co-occurrence fragment, or (dead=true) a hash tombstone. */
  case class Frag(h: Long, d1: Long, d2: Long, dead: Boolean)

  /** The stateful gate: fragments + tombstones, append mode. */
  def fragments(fps: Dataset[Fp], maxDf: Int): Dataset[Frag] = {
    import fps.sparkSession.implicits._
    fps.groupByKey(_.h)
      .flatMapGroupsWithState[List[Long], Frag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (h, rows, state) =>
          var docs = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[Frag]()
          rows.toSeq.sortBy(_.doc_id).foreach { f =>
            if (!docs.contains(f.doc_id)) {
              if (docs.size < maxDf) {
                docs.foreach { d =>
                  out += Frag(h, math.min(d, f.doc_id),
                    math.max(d, f.doc_id), dead = false)
                }
                docs = f.doc_id :: docs
              } else if (docs.size == maxDf) {
                // cap breached: one tombstone, remember deadness (+1)
                out += Frag(h, -1L, -1L, dead = true)
                docs = f.doc_id :: docs
              } // already dead: ignore
            }
          }
          state.update(docs)
          out.iterator
      }
  }

  /** Tombstone-resolved pair view over accumulated fragments: drop
    * every fragment of a dead hash, then count shared fingerprints
    * per pair — equals batch `winnowingPairs` over the same corpus. */
  def pairsFromFragments(frags: DataFrame, minShared: Int): DataFrame = {
    // liveness via one per-hash window instead of a self-anti-join: a
    // single shuffle on h, and no conflicting-attribute lineage when
    // the caller hands us a memory-sink view
    val wH = org.apache.spark.sql.expressions.Window.partitionBy("h")
    frags
      .withColumn("any_dead", max(col("dead")).over(wH))
      .filter(!col("dead") && !col("any_dead"))
      .groupBy(col("d1").as("doc_a"), col("d2").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }
}
