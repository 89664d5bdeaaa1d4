package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming token-budget admission gate — the ENFORCEMENT half of the
  * batch allocator (`pipeline_budget_allocation`, #318): the allocator
  * decides each source's token budget offline; this gate holds the
  * line online as documents arrive, admitting a document only while
  * its source's quota has room for the WHOLE document (no splitting —
  * the same all-or-nothing rule as the sequence packer). Greedy
  * first-fit in doc_id order within each trigger: an oversize document
  * is rejected but does NOT close the source — a later smaller one may
  * still fit the remainder.
  *
  * State per source is ONE long (tokens admitted so far) — O(sources)
  * state total, hash-partitioned on source, so 1000 executors shard
  * the source space and a quota check is one state read. Determinism:
  * for any PREFIX batching of a doc_id-ordered feed (how a replayed
  * ingest actually arrives), the admitted set equals the single batch
  * fold — the parity [[batchAdmission]] provides and the spec pins.
  */
object StreamBudget {

  /** Inbound document grain: identity, routing key, token count. */
  case class Doc(doc_id: Long, source: String, n_toks: Long)

  /** Gate verdict: `cum_toks` is the source's admitted-token total
    * AFTER this decision (unchanged when `admitted` is false). */
  case class Admit(doc_id: Long, source: String, n_toks: Long,
                   cum_toks: Long, admitted: Boolean)

  private def fold(src: String, docs: Seq[Doc], used0: Long,
                   quota: Map[String, Long]): (Seq[Admit], Long) = {
    val q = quota.getOrElse(src, 0L)
    var used = used0
    val out = docs.sortBy(_.doc_id).map { d =>
      val fits = used + d.n_toks <= q
      if (fits) used += d.n_toks
      Admit(d.doc_id, src, d.n_toks, used, fits)
    }
    (out, used)
  }

  /** The streaming gate. Emits a verdict row per document (set
    * `emitRejected = false` to emit admissions only — the audit trail
    * of WHY a document was dropped usually earns its rows). */
  def admissionGate(docs: Dataset[Doc], quota: Map[String, Long],
                    emitRejected: Boolean = true): Dataset[Admit] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state) =>
          val (out, used) =
            fold(src, rows.toSeq, state.getOption.getOrElse(0L), quota)
          state.update(used)
          (if (emitRejected) out else out.filter(_.admitted)).iterator
      }
  }

  /** Batch twin: the same greedy doc_id-ordered fold per source, as a
    * one-shot Dataset op (per-source folds run in parallel across the
    * source partitioning; the fold itself is inherently sequential —
    * that is the SEMANTICS of a running quota, not an implementation
    * shortcut). The streaming gate over any prefix batching equals
    * this. */
  def batchAdmission(spark: SparkSession, docs: Seq[Doc],
                     quota: Map[String, Long]): Dataset[Admit] = {
    import spark.implicits._
    docs.toDS().groupByKey(_.source).flatMapGroups {
      (src: String, rows: Iterator[Doc]) =>
        fold(src, rows.toSeq, 0L, quota)._1.iterator
    }
  }
}
