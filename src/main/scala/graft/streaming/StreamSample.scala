package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.ThetaSketchFunctions

/** Streaming deterministic sampling: the batch per-group sample
  * (`sample_per_source` — bottom-k documents by a seeded content hash)
  * maintained incrementally over a stream. The KMV buffer (k smallest
  * distinct hashes + their payloads) is MERGEABLE and a pure function
  * of the input SET, so the streamed sample after any prefix equals
  * the batch sample over the same rows — no reservoir randomness, no
  * order dependence, exactly reproducible across replays and between
  * the batch and streaming runtimes.
  *
  * This is the sampling primitive a 100 TB ingest wants: per-feed audit
  * samples that stay VALID as the feed grows (each group's state is
  * O(k), the k-smallest-hash invariant survives unions), instead of
  * periodic batch re-samples that churn the audit set.
  */
object StreamSample {

  /** Hash seed shared with the batch sampler — same key space, same
    * sample. */
  val SampleSeed = "sample:"

  /** Per-group bottom-k-by-hash sample over a (streaming or batch)
    * frame: groups by `groupCol`, samples int64 `idCol` by the seeded
    * content hash, emits `sample: array<struct<h,v>>` sorted by hash.
    * Streaming: run in complete/update output mode; state is
    * O(groups·k) longs however many rows stream through. */
  def perGroupSample(df: DataFrame, groupCol: String, idCol: String,
                     k: Int): DataFrame =
    df.select(col(groupCol),
        graft.functions.Hashing.h64(
          concat(lit(SampleSeed), col(idCol).cast("string"))).as("h"),
        col(idCol).cast("long").as("v"))
      .groupBy(groupCol)
      .agg(ThetaSketchFunctions.kmvSample(col("h"), col("v"), k).as("sample"))
}
