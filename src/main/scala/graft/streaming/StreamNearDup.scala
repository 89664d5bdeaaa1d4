package graft.streaming

import graft.operators.MinHashLSH
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: documents arrive as a stream
  * and are checked against everything already seen — the
  * LLM-ingest-time form of the batch MinHash/LSH dedup.
  *
  * Per (band, signature) bucket, `flatMapGroupsWithState` keeps the doc
  * ids already seen in that bucket (bounded by the SAME
  * `MinHashLSH.MaxBucketSize` cap as the batch operator — a saturated
  * bucket stops emitting and stops growing, so state per key is O(cap)
  * and a degenerate boilerplate signature cannot OOM the state store).
  * A new arrival emits one candidate pair per stored neighbor; pairs
  * found in several bands are deduplicated downstream. Exact Jaccard
  * verification stays a batch concern (candidates ⊇ verified pairs —
  * same contract as the batch plan, where band collision is also only
  * the recall stage).
  *
  * Cap semantics differ from batch BY NECESSITY: append-mode output
  * cannot be retracted, so a saturating bucket keeps the pairs its
  * first `cap` members already produced (prefix cap), while the batch
  * operator drops the whole overfull bucket. Below the cap the two
  * candidate sets are identical (StreamNearDupSpec pins this).
  */
object StreamNearDup {

  case class BandSig(doc_id: Long, band: Int, sig: Long)
  case class Candidate(d1: Long, d2: Long)
  /** Per-(band, sig) state: doc ids seen in the bucket, ≤ cap. */
  case class Bucket(docs: Array[Long])

  /** (doc_id, band, sig) rows for a (doc_id, text) stream — the fused
    * shingle+minhash+band pipeline, entirely inside the scan stage. */
  def bandSignatures(docs: DataFrame): DataFrame =
    MinHashLSH.bandSignatures(docs)
      .select(col("doc_id"), col("band").cast("int").as("band"), col("sig"))

  /** Candidate near-dup pairs of a streaming (doc_id, text) frame,
    * ordered (d1 < d2). Append mode; state per bucket is the capped
    * member list. */
  def candidates(spark: SparkSession, docs: DataFrame,
                 maxBucket: Int = MinHashLSH.MaxBucketSize): Dataset[Candidate] = {
    import spark.implicits._
    val sigs = bandSignatures(docs).as[BandSig]

    def fn(key: (Int, Long), rows: Iterator[BandSig],
           state: GroupState[Bucket]): Iterator[Candidate] = {
      var docs = state.getOption.map(_.docs.toList).getOrElse(Nil)
      val out = List.newBuilder[Candidate]
      // deterministic order within a trigger batch
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (docs.length < maxBucket && !docs.contains(r.doc_id)) {
          docs.foreach { prior =>
            out += (if (prior < r.doc_id) Candidate(prior, r.doc_id)
                    else Candidate(r.doc_id, prior))
          }
          docs = r.doc_id :: docs
        }
        // saturated bucket: degenerate signature — stop emitting new
        // pairs and stop growing state, as the batch cap does
      }
      state.update(Bucket(docs.toArray))
      out.result().iterator
    }

    sigs.groupByKey(s => (s.band, s.sig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
