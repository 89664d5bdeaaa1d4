package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.GramSumAggFunctions

/** Streaming spectral maintenance: the same mergeable Gram-moment
  * aggregate the batch covariance tier uses
  * ([[graft.plans.GramSumAgg]]), running as a Structured Streaming
  * global aggregation — state is ONE d(d+3)/2+1-long buffer however
  * many vectors stream through, updated per micro-batch by the exact
  * element-wise-add merge the batch side proves.
  *
  * Because the buffer is a pure function of the input SET (integer
  * sums, order-independent), the streaming state after any prefix
  * equals the batch aggregate over the same rows — an exact parity
  * oracle. A drift monitor runs [[graft.operators.Spectral.jacobiEigen]]
  * / [[graft.operators.Spectral.effectiveRank]] over each emitted
  * buffer to watch the embedding spectrum collapse or rotate as a
  * corpus grows — per-trigger cost is O(d²) driver math off O(d²)
  * state, independent of stream volume. */
object StreamSpectral {

  /** Running Gram moments over a batch OR streaming frame with a
    * `u: array<long>` column (the u3-quantized embedding). Streaming:
    * run in complete/update output mode; each trigger emits the
    * current [n | sums | upper-triangle cross products] buffer plus
    * the vector count (g[0], surfaced for monitors that gate on
    * sample size). */
  def gramMoments(vecs: DataFrame, dim: Int): DataFrame =
    vecs.agg(GramSumAggFunctions.gramSumAgg(col("u"), dim).as("g"))
      .select(element_at(col("g"), 1).as("n_vecs"), col("g"))

  /** Per-LABEL running Gram moments over a `(label, u)` frame — the
    * streaming maintenance of the supervised scatter tier
    * ([[graft.operators.Spectral.labelScatter]]): state is one moment
    * buffer PER LABEL (O(labels·d²) longs total, independent of stream
    * volume), each merged by the same element-wise add. A monitor
    * derives between/within scatter per trigger from the emitted
    * buffers alone — no second look at the data — so label-geometry
    * drift (a class collapsing into another) is visible as the corpus
    * streams in. Same purity argument as [[gramMoments]]: the grouped
    * buffer is a pure function of each label's row set, so
    * streaming-after-any-prefix equals the batch groupBy. */
  def labelMoments(vecs: DataFrame, dim: Int): DataFrame =
    vecs.groupBy("label")
      .agg(GramSumAggFunctions.gramSumAgg(col("u"), dim).as("g"))
      .select(col("label"), element_at(col("g"), 1).as("n_vecs"), col("g"))
}
