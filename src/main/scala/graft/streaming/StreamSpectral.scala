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
}
