package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN index maintenance — the online form of the
  * build-once/query-many lifecycle: a vector ingest stream appends each
  * micro-batch to a SAVED index under frozen quantizers
  * (Similarity.appendToIndex: assignment to the existing centroids,
  * encoding with the existing codebooks, deterministic-plane buckets).
  *
  * foreachBatch is the right shape here — the append is three parquet
  * writes per batch, each a deterministic pure function of the batch
  * rows, so batch-order and batch-boundary placement cannot change the
  * final index (IndexStoreSpec pins the batch-invariance; the streaming
  * spec pins stream-fed == batch-fed). Exactly-once across restarts
  * follows from Structured Streaming's batch-id contract as with any
  * idempotent-by-key foreachBatch sink; the per-vector artifact rows are
  * keyed by vec_id, so a replayed batch can be deduplicated downstream
  * by the same exact-dedup machinery the engine ships.
  */
object StreamIndex {

  /** Start appending a streaming (vec_id, e) frame to the saved index. */
  def appendStream(indexDir: String, newVecs: DataFrame): StreamingQuery =
    newVecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Similarity.appendToIndex(batch.sparkSession, indexDir, batch)
      }
      .start()
}
