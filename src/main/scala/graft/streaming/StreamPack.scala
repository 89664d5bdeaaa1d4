package graft.streaming

import graft.operators.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sequence packing: each micro-batch of (doc_id, n_toks)
  * rows is packed CONTINUING the persisted corpus token total, so an
  * ingest pipeline emits training-sequence assignments incrementally
  * and the concatenation of all batches equals the one-shot pack of the
  * full corpus (the fold-equals-full-pass contract the incremental
  * dedup keeps). Requires batches in document order: every doc_id of
  * batch i precedes batch i+1 — the natural landing-partition shape,
  * and the same ordering contract as [[graft.operators.IncrementalDedup]].
  *
  * Per batch: one [[Pipeline.packOf]] pass (range-partitioned native
  * prefix sum — never a single-partition window) plus one O(1)-row
  * aggregate for the state update. State is ONE long (the running token
  * total); production persists it with the sink transaction. */
object StreamPack {

  /** Pack one batch against the prior corpus token total.
    * @return (packed rows, updated total) */
  def packBatch(totalSoFar: Long, batch: DataFrame,
                seqLen: Long = Pipeline.PackSeqLen): (DataFrame, Long) = {
    val added = batch.agg(coalesce(sum("n_toks"), lit(0L)).as("s"))
      .collect()(0).getLong(0)
    (Pipeline.packOf(batch, seqLen, baseOffset = totalSoFar), totalSoFar + added)
  }

  /** Driver-side fold state for a `foreachBatch` sink: call [[pack]]
    * per micro-batch; `totalTokens` is the value to persist/restore
    * across restarts (checkpoint it with the sink transaction). */
  final class Packer(seqLen: Long = Pipeline.PackSeqLen,
                     initialTotal: Long = 0L) extends Serializable {
    @volatile private var total = initialTotal
    def totalTokens: Long = total
    def pack(batch: DataFrame): DataFrame = synchronized {
      val (packed, t) = packBatch(total, batch, seqLen)
      total = t
      packed
    }
  }
}
