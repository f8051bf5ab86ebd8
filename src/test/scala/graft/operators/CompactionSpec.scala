package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** OPTIMIZE for the standing indexes: compaction must cut file counts
  * to one-per-bucket / one-per-cell while PRESERVING the layout that
  * makes the index an index — the bucket spec (zero index-side
  * exchange in the band join) and the cell partitioning (partition
  * pruning in the probed search) — and must not change any result.
  */
class CompactionSpec extends SparkFunSuite {

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def dataFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") ||
        f.getName.startsWith("part-")) Seq(f)
      else Nil
    walk(dir)
  }

  test("compactBandIndex: one file per bucket, same pairs, still exchange-free") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val idxT = graft.model.TableRef("graft_test", "band_idx_compact")
    val corpus = docs.filter(col("doc_id") < 300)
    val wave1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    val wave2 = docs.filter(col("doc_id") >= 350 && col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    try {
      Dedup.writeBandIndex(corpus, "doc_id", "text", idxT)
      Dedup.appendToBandIndex(wave1, "doc_id", "text", idxT)
      Dedup.appendToBandIndex(wave2, "doc_id", "text", idxT)
      val grown = corpus.unionByName(wave1).unionByName(wave2)
      val before = Dedup.minhashNearDupsAgainstIndex(
        batch, grown, "doc_id", "text", 0.5, idxT)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val loc = new java.io.File(new java.net.URI(
        s.sql(s"DESC FORMATTED ${idxT.qualified}")
          .filter(col("col_name") === "Location")
          .head().getString(1)))
      val filesBefore = dataFiles(loc).size
      assert(filesBefore > 8,
        s"appends should have accreted >8 files, found $filesBefore")

      Dedup.compactBandIndex(s, idxT, buckets = 8)
      val filesAfter = dataFiles(new java.io.File(new java.net.URI(
        s.sql(s"DESC FORMATTED ${idxT.qualified}")
          .filter(col("col_name") === "Location")
          .head().getString(1)))).size
      assert(filesAfter == 8, s"expected 8 bucket files, got $filesAfter")

      val after = Dedup.minhashNearDupsAgainstIndex(
        batch, grown, "doc_id", "text", 0.5, idxT)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after.nonEmpty && after == before)

      // bucket spec preserved: with broadcast disabled the band join
      // still reads the index side straight off its bucketed scan —
      // exactly ONE (band, key) exchange in the plan (the batch's)
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val cand = Dedup.bandsFromRelation(
          Dedup.shingleRelation(batch, "doc_id", "text"), 6, 2).as("x")
          .join(s.table(idxT.qualified).as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key"))
        cand.collect()
        val plan = cand.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(plan.contains("SelectedBucketsCount"), plan)
        assert("hashpartitioning\\(band".r.findAllMatchIn(plan).length == 1,
          s"compacted index must still join without its own exchange:\n$plan")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally graft.sources.CatalogOps.dropTable(s, idxT)
  }

  test("compactIvfIndex: one file per cell, same search, still pruned") {
    val path = tmpDir("ivf_compact")
    val corpus = emb.filter(col("vec_id") < 400)
    val wave = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    Similarity.writeIvfIndex(corpus, path, nlist = 16)
    Similarity.appendToIvfIndex(wave, path)

    val cellsDir = new java.io.File(s"$path/cells")
    val cellCount = cellsDir.listFiles()
      .count(_.getName.startsWith("cell="))
    val filesBefore = dataFiles(cellsDir).size
    assert(filesBefore > cellCount,
      s"append should leave >1 file in some cell ($filesBefore/$cellCount)")
    val before = Similarity.ivfTopKIndexed(spark, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    Similarity.compactIvfIndex(spark, path)
    val filesAfter = dataFiles(new java.io.File(s"$path/cells")).size
    assert(filesAfter == cellCount,
      s"expected one file per cell ($cellCount), got $filesAfter")

    val indexed = Similarity.ivfTopKIndexed(spark, path, queries, k = 5)
    val after = indexed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(after.nonEmpty && after == before)

    // cell partitioning preserved: the probed scan still prunes
    val plan = indexed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[cell#\\d+ INSET".r
      .findFirstIn(plan).isDefined, s"pruning lost after compaction:\n$plan")
  }

  test("compactIvfPqIndex: one file per cell, ADC search unchanged") {
    val cbooks = Similarity
      .pqSubvecs(emb.filter(col("vec_id") < 16), 8, 8, "vec_id", "embedding")
      .select(col("vec_id").cast("int").as("cid"), col("m"),
        col("sv").as("cv"))
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    val path = tmpDir("ivfpq_compact")
    val base = emb.filter(col("vec_id") < 400)
    val baseCodes = Similarity.pqEncode(base, cbooks)
    Similarity.writeIvfPqIndex(baseCodes, cbooks, path)
    Similarity.appendToIvfPqIndex(emb.filter(col("vec_id") >= 400), path)

    val before = Similarity.adcIvfTopKIndexed(spark, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    Similarity.compactIvfPqIndex(spark, path)
    val codesDir = new java.io.File(s"$path/codes")
    val cellCount = codesDir.listFiles().count(_.getName.startsWith("cell="))
    assert(dataFiles(codesDir).size == cellCount,
      s"expected one file per cell ($cellCount), got ${dataFiles(codesDir).size}")
    val after = Similarity.adcIvfTopKIndexed(spark, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(after.nonEmpty && after == before)
  }

  test("compactCellIndex: hot cell splits into size-bounded files, pruning kept") {
    // A deliberately skewed layout: cell 0 holds 50× the rows of every
    // other cell — the "one arbitrarily large task and file per hot
    // cell" hazard the size bound exists for. Accrete it over several
    // appends (the small-files state compaction starts from), then
    // compact with a small per-file cap and assert the cap holds for
    // EVERY emitted file while partition pruning survives.
    import org.apache.spark.sql.functions.{input_file_name, lit}
    val s = spark
    import s.implicits._
    val dir = tmpDir("cell_skew") + "/cells"
    val hot = (0L until 5000L).map(v => (v, 0))
    val cold = (5000L until 5400L).map(v => (v, 1 + (v % 4).toInt))
    def rows(chunk: Seq[(Long, Int)]) =
      chunk.toDF("vid", "cell").withColumn("_batch", lit(-1L))
    Seq(hot.take(2000), hot.slice(2000, 4000), hot.drop(4000) ++ cold)
      .foreach(c => rows(c).write.mode("append")
        .partitionBy("cell", "_batch").parquet(dir))
    assert(dataFiles(new java.io.File(dir)).size > 5)

    Similarity.compactCellIndex(s, dir, maxRecordsPerFile = 500L)

    val perFile = s.read.parquet(dir)
      .groupBy(input_file_name().as("f")).count().collect()
    assert(perFile.forall(_.getLong(1) <= 500L),
      s"files over the 500-row cap: ${perFile.filter(_.getLong(1) > 500L).mkString(", ")}")
    // the hot cell must have split into >1 file, not one giant one
    val hotFiles = perFile.count(_.getString(0).contains("cell=0/"))
    assert(hotFiles >= 10, s"hot cell should span >=10 capped files, got $hotFiles")
    // pruning survives the rewrite
    val pruned = s.read.parquet(dir).filter(col("cell") === 1)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[.*cell".r.findFirstIn(plan).isDefined, plan)
    assert(s.read.parquet(dir).count() == 5400L)
  }

  test("recoverBandIndex: an unbound live table heals on the next band join") {
    // Catalog twin of the cell-dir recovery: crash mid-swap leaves the
    // live NAME unbound with the compacted staging table complete; the
    // next read must roll forward transparently.
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val idxT = graft.model.TableRef("graft_test", "band_idx_recover")
    val corpus = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 400)
    try {
      Dedup.writeBandIndex(corpus, "doc_id", "text", idxT)
      val before = Dedup.minhashNearDupsAgainstIndex(
        batch, corpus, "doc_id", "text", 0.5, idxT)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // stage a compacted copy, then crash between the renames
      val staging = graft.model.TableRef(idxT.db, idxT.table + "_compacting")
      graft.sources.CatalogOps.writeBucketed(
        s.table(idxT.qualified), staging,
        bucketCols = Seq("band", "key"), numBuckets = 8,
        sortCols = Seq("band", "key"))
      graft.sources.CatalogOps.renameTable(s,
        idxT, graft.model.TableRef(idxT.db, idxT.table + "_old"))
      assert(!graft.sources.CatalogOps.tableExists(s, idxT))
      val healed = Dedup.minhashNearDupsAgainstIndex(
        batch, corpus, "doc_id", "text", 0.5, idxT)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(healed == before && healed.nonEmpty)
      assert(graft.sources.CatalogOps.tableExists(s, idxT))
      assert(!graft.sources.CatalogOps.tableExists(s,
        graft.model.TableRef(idxT.db, idxT.table + "_old")))
      assert(!graft.sources.CatalogOps.tableExists(s,
        graft.model.TableRef(idxT.db, idxT.table + "_compacting")))
    } finally {
      Seq("", "_old", "_compacting").foreach(sfx =>
        graft.sources.CatalogOps.dropTable(s,
          graft.model.TableRef(idxT.db, idxT.table + sfx)))
    }
  }

  test("append after a torn swap heals first instead of stranding the full index") {
    // The review-flagged failure class: an append landing while the
    // live dir is unbound (crash between the publish renames) must NOT
    // recreate the dir batch-sized — it must roll the staged full copy
    // forward first, then append into it.
    val s = spark
    val path = tmpDir("ivf_append_heal")
    val base = emb.filter(col("vec_id") < 400)
    val wave = emb.filter(col("vec_id") >= 400)
    Similarity.writeIvfIndex(base, path, nlist = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // stage a complete compacted copy, crash mid-swap
    s.read.parquet(s"$path/cells").repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells._compacting")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/cells"),
      new org.apache.hadoop.fs.Path(s"$path/cells._old")))

    Similarity.appendToIvfIndex(wave, path)

    // the healed-and-grown index holds base AND wave, not wave alone
    val vids = s.read.parquet(s"$path/cells").select("vid").distinct().count()
    assert(vids == emb.count(), s"index holds $vids of ${emb.count()} vids")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/cells._old")))
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$path/cells._compacting")))
  }

  test("recoverCellDir: a crash between the publish renames heals on next open") {
    // Simulate the torn-swap window: live dir renamed aside (first
    // rename done), staged copy present, second rename never ran. The
    // next search must roll FORWARD to the staged copy transparently.
    val s = spark
    val path = tmpDir("ivf_recover")
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    Similarity.writeIvfIndex(emb, path, nlist = 16)
    val before = Similarity.ivfTopKIndexed(s, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val cells = new org.apache.hadoop.fs.Path(s"$path/cells")
    // stage a complete compacted copy, then crash mid-swap
    s.read.parquet(s"$path/cells").repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells._compacting")
    assert(fs.rename(cells, new org.apache.hadoop.fs.Path(s"$path/cells._old")))
    assert(!fs.exists(cells))

    val healed = Similarity.ivfTopKIndexed(s, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(healed == before)
    assert(fs.exists(cells) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/cells._old")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/cells._compacting")))
  }
}
