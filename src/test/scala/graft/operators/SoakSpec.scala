package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Standing-index SOAK: the small-files spiral, the compaction rewrite,
  * and the probed search exercised TOGETHER on one index instance —
  * N append batches × interleaved compactions × searches — rather than
  * in the separate per-mechanism cases of IvfIndexSpec/CompactionSpec.
  * After every cycle the index must answer exactly like a fresh full
  * rebuild over the same content, and every compaction must leave the
  * bounded file layout the OPTIMIZE contract promises.
  */
class SoakSpec extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  private def dataFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") ||
        f.getName.startsWith("part-")) Seq(f)
      else Nil
    walk(dir)
  }

  test("IVFPQ index: interleaved append x compact x search stays rebuild-exact") {
    val cbooks = Similarity
      .pqSubvecs(emb.filter(col("vec_id") < 16), 8, 8, "vec_id", "embedding")
      .select(col("vec_id").cast("int").as("cid"), col("m"),
        col("sv").as("cv"))
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val path = tmpDir("ivfpq_soak")
    Similarity.writeIvfPqIndex(
      Similarity.pqEncode(emb.filter(col("vec_id") < 300), cbooks),
      cbooks, path)
    val waves = Seq((300L, 350L), (350L, 400L), (400L, 450L), (450L, 500L))
    waves.zipWithIndex.foreach { case ((lo, hi), i) =>
      Similarity.appendToIvfPqIndex(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), path)
      if (i % 2 == 1) {
        // every other cycle: compact mid-life, not just at the end
        val codesDir = new java.io.File(s"$path/codes")
        val before = dataFiles(codesDir).size
        Similarity.compactIvfPqIndex(spark, path)
        val cells = codesDir.listFiles().count(_.getName.startsWith("cell="))
        val after = dataFiles(codesDir).size
        assert(after == cells,
          s"cycle $i: expected one file per cell ($cells), got $after")
        assert(after < before,
          s"cycle $i: compaction must shrink the file count ($before→$after)")
      }
      // the soaked index answers exactly like a fresh rebuild over the
      // same content — append/compact mechanics leave no trace
      val ref = tmpDir(s"ivfpq_soak_ref$i")
      Similarity.writeIvfPqIndex(
        Similarity.pqEncode(emb.filter(col("vec_id") < hi), cbooks),
        cbooks, ref)
      val got = rows(Similarity.adcIvfTopKIndexed(spark, path, queries, k = 5))
      val want = rows(Similarity.adcIvfTopKIndexed(spark, ref, queries, k = 5))
      assert(got.nonEmpty && got == want, s"cycle $i diverged from rebuild")
    }
  }

  test("band index: interleaved append x compact x probe stays rebuild-exact") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val idxT = graft.model.TableRef("graft_test", "band_idx_soak")
    val refTs = (0 to 2).map(i =>
      graft.model.TableRef("graft_test", s"band_idx_soak_ref$i"))
    val batch = docs.filter(col("doc_id") >= 450)
    try {
      Dedup.writeBandIndex(docs.filter(col("doc_id") < 300),
        "doc_id", "text", idxT)
      val waves = Seq((300L, 350L), (350L, 400L), (400L, 450L))
      var anyPair = false
      waves.zipWithIndex.foreach { case ((lo, hi), i) =>
        Dedup.appendToBandIndex(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", idxT)
        if (i % 2 == 1) {
          Dedup.compactBandIndex(s, idxT, buckets = 8)
          val loc = new java.io.File(new java.net.URI(
            s.sql(s"DESC FORMATTED ${idxT.qualified}")
              .filter(col("col_name") === "Location").head().getString(1)))
          assert(dataFiles(loc).size == 8,
            s"cycle $i: expected 8 bucket files, got ${dataFiles(loc).size}")
        }
        val grown = docs.filter(col("doc_id") < hi)
        Dedup.writeBandIndex(grown, "doc_id", "text", refTs(i))
        val got = Dedup.minhashNearDupsAgainstIndex(
          batch, grown, "doc_id", "text", 0.5, idxT)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = Dedup.minhashNearDupsAgainstIndex(
          batch, grown, "doc_id", "text", 0.5, refTs(i))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"cycle $i diverged from rebuild")
        anyPair ||= got.nonEmpty
      }
      assert(anyPair, "soak must exercise at least one real near-dup pair")
    } finally {
      graft.sources.CatalogOps.dropTable(s, idxT)
      refTs.foreach(graft.sources.CatalogOps.dropTable(s, _))
    }
  }
}
