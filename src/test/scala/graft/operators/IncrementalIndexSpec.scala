package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental LSH index maintenance == full recompute, partitioned by
  * pair provenance: pairs from the incremental batch are exactly the
  * full-corpus pairs that involve a new doc, and the appended index
  * tables equal the from-scratch index. The old corpus is read back
  * from PARQUET (the persisted-index deployment shape), proving the
  * batch plan needs no old document text. */
class IncrementalIndexSpec extends SparkSpec {

  test("incremental batch pairs + old pairs == full recompute; index tables append-equal") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val cut = 250L
    val oldDocs = docs.filter(col("doc_id") < cut)
    val newDocs = docs.filter(col("doc_id") >= cut)

    // persist the old index the way production would
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    MinHashLSH.bandSignatures(oldDocs).write.parquet(s"$dir/sigs")
    DocDedup.docShinglesOf(oldDocs).write.parquet(s"$dir/shingles")
    val oldSigs = spark.read.parquet(s"$dir/sigs")
    val oldSh = spark.read.parquet(s"$dir/shingles")

    val (newSigs, newSh, incPairs) =
      MinHashLSH.incrementalNearDupPairs(oldSigs, oldSh, newDocs)

    val full = MinHashLSH.nearDupPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val isNew = (d: Long) => d >= cut
    val fullNewInvolving = full.filter { case (d1, d2, _) => isNew(d1) || isNew(d2) }
    val fullOldOnly = full -- fullNewInvolving

    val inc = incPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == fullNewInvolving,
      "incremental pairs must be exactly the full-corpus pairs involving a new doc")

    val oldPairs = MinHashLSH.nearDupPairsOf(oldDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(oldPairs == fullOldOnly,
      "old-corpus pairs must be exactly the full-corpus old-old pairs (no cap transition in this data)")

    // appended index == from-scratch index
    val appended = oldSigs.select("doc_id", "band", "sig")
      .unionByName(newSigs.select("doc_id", "band", "sig")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val scratch = MinHashLSH.bandSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(appended == scratch)
    val appendedSh = oldSh.unionByName(newSh).count()
    assert(appendedSh == DocDedup.docShinglesOf(docs).count())
  }
}
