package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.operators.{TextAnalysis => TA}

/** End-to-end corpus curation: stage counts are consistent, every
  * stage's invariant holds on the written output, and the pipeline is
  * deterministic.
  */
class CurationSpec extends SparkFunSuite {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("curate: monotone stage counts, written corpus honors every stage invariant") {
    val out = tmpDir("curated")
    val rep = Curation.curate(docs, out, jaccard = 0.3)
    // counts monotone and consistent with the written corpus
    assert(rep.input == docs.count())
    assert(rep.afterQuality <= rep.input)
    assert(rep.afterExactDedup <= rep.afterQuality)
    assert(rep.afterNearDup <= rep.afterExactDedup)
    assert(rep.afterNearDup > 0, "curation must not drop everything")
    assert(rep.bySplit.values.sum == rep.afterNearDup)
    assert(rep.bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val curated = spark.read.parquet(out)
    assert(curated.count() == rep.afterNearDup)
    // quality: every surviving doc passes the Gopher gate
    assert(curated.filter(!TA.gopherPass(col("text"))).count() == 0)
    // exact dedup: no two survivors share a fingerprint
    val fp = curated.select(TA.fingerprint(col("text")).as("fp"))
    assert(fp.distinct().count() == rep.afterNearDup)
    // near-dup: no surviving pair at or above the collapse threshold
    assert(Dedup.minhashNearDups(curated, "doc_id", "text", 0.3).count() == 0,
      "near-dup collapse must leave no pair above the threshold")
    // split column matches the deterministic hash assignment
    assert(curated.filter(
      col("split") =!= TA.hashSplit(col("doc_id"))).count() == 0)
  }

  test("curate: deterministic across runs") {
    val r1 = Curation.curate(docs, tmpDir("cur_a"), jaccard = 0.3)
    val r2 = Curation.curate(docs, tmpDir("cur_b"), jaccard = 0.3)
    assert(r1 == r2)
  }
}
