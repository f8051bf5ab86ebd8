package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite
import graft.model.TableRef
import graft.sources.{CatalogOps, EpochDir}

/** The OPTIMIZE policy: files-per-unit stats count ingest history, the
  * IfNeeded trigger compacts exactly when the cap is crossed (and not
  * before), and content/results survive unchanged.
  */
class IndexMaintenanceSpec extends SparkFunSuite {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("bucketed index: stats track appends; IfNeeded compacts past the cap only") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val ref = TableRef("graft_test", "band_idx_maint")
    try {
      Dedup.writeBandIndex(docs.filter(col("doc_id") < 300),
        "doc_id", "text", ref)
      Dedup.appendToBandIndex(
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 350),
        "doc_id", "text", ref)
      Dedup.appendToBandIndex(
        docs.filter(col("doc_id") >= 350 && col("doc_id") < 400),
        "doc_id", "text", ref)
      val st = IndexMaintenance.describeBucketed(s, ref)
      // build lands 1 file/bucket, each append adds 1 more
      assert(st.unitCount == 8 && st.filesPerUnit == 3.0,
        s"expected 3 files per bucket after build+2 appends: $st")
      assert(st.liveEpoch == 0 && st.epochs == Seq(0L))
      val rowsBefore = s.table(ref.qualified).count()

      // under the cap: no compaction, epoch unchanged
      assert(!IndexMaintenance.compactBucketedIfNeeded(s, ref,
        Seq("band", "key"), buckets = 8, maxFilesPerUnit = 3.0))
      assert(CatalogOps.currentEpoch(s, ref).contains(0L))

      // over the cap: compaction publishes epoch 1, one file per
      // bucket, content preserved
      assert(IndexMaintenance.compactBucketedIfNeeded(s, ref,
        Seq("band", "key"), buckets = 8, maxFilesPerUnit = 2.9))
      val after = IndexMaintenance.describeBucketed(s, ref)
      assert(after.liveEpoch == 1 && after.filesPerUnit == 1.0, s"$after")
      assert(s.table(ref.qualified).count() == rowsBefore)
      // and now a no-op again
      assert(!IndexMaintenance.compactBucketedIfNeeded(s, ref,
        Seq("band", "key"), buckets = 8, maxFilesPerUnit = 2.9))
    } finally CatalogOps.dropEpochIndex(s, ref)
  }

  test("cell store: stats track appends; IfNeeded compacts, search results unchanged") {
    val path = tmpDir("ivf_maint")
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 300), path,
      nlist = 16)
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400), path)
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 400), path)
    val st = IndexMaintenance.describeCells(spark, s"$path/cells")
    assert(st.unitCount > 1 && st.filesPerUnit > 1.0,
      s"appends must accrete files per cell: $st")
    def rows() = Similarity.ivfTopKIndexed(spark, path, queries,
      k = 5, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = rows()
    // a cap above the current accretion: no-op
    assert(!IndexMaintenance.compactCellsIfNeeded(spark, s"$path/cells",
      maxFilesPerUnit = st.filesPerUnit + 1))
    assert(IndexMaintenance.describeCells(spark, s"$path/cells")
      .liveEpoch == st.liveEpoch)
    // a cap below it: compaction publishes the next epoch, file count
    // drops, results identical
    assert(IndexMaintenance.compactCellsIfNeeded(spark, s"$path/cells",
      maxFilesPerUnit = st.filesPerUnit - 0.5))
    val after = IndexMaintenance.describeCells(spark, s"$path/cells")
    assert(after.liveEpoch == st.liveEpoch + 1)
    assert(after.dataFiles < st.dataFiles, s"$st -> $after")
    assert(rows() == want, "compaction must not change search results")
  }
}
