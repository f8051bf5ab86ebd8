package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.operators.Dedup
import graft.sources.CatalogOps

/** Streaming incremental dedup: the stream-static pipeline's confirmed
  * pairs must equal the batch operator's, and the zero-shuffle per-row
  * banding must emit exactly the relation-path band rows.
  */
class DocStreamsSpec extends SparkFunSuite {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("mapOnlyBands == bandsFromRelation (identical band rows)") {
    val viaRows = Dedup.mapOnlyBands(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaRel = Dedup.bandsFromRelation(
      Dedup.shingleRelation(docs, "doc_id", "text"), 6, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaRows.nonEmpty && viaRows == viaRel)
  }

  test("mapOnlyBands: docs with < n tokens emit no bands instead of failing (ADVICE r11)") {
    val s = spark
    import s.implicits._
    // one-token and two-token docs previously made sequence(1, size-2)
    // descend and element_at(toks, 0) throw at runtime — fatal to a
    // whole streaming micro-batch; a 3+-token doc alongside must still
    // band normally.
    val mixed = Seq((1L, "single"), (2L, "two tokens"),
      (3L, "three token doc here")).toDF("doc_id", "text")
    val bands = Dedup.mapOnlyBands(mixed, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(bands == Set(3L), s"short docs must emit no bands, got $bands")
  }

  test("assignCellsMapOnly == assignCells (identical cells, zero exchanges)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centvec"))
    val centVals = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    val viaAgg = graft.operators.Similarity
      .assignCells(emb, cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val mapOnly = graft.operators.Similarity
      .assignCellsMapOnly(emb, centVals)
    val viaMap = mapOnly.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaMap.nonEmpty && viaMap == viaAgg)
    assert(!mapOnly.queryExecution.executedPlan.toString.contains("Exchange"),
      "map-only assignment must not shuffle")
  }

  test("streaming semantic dedup against the IVF index == batch incremental operator") {
    val s = spark
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val idxPath = tmpDir("sem_stream_idx")
    val streamDir = tmpDir("emb_stream")
    val outDir = tmpDir("sem_out")
    graft.operators.Similarity.writeIvfIndex(corpus, idxPath, nlist = 16)
    // stage the arriving batch as one flat parquet file
    val staged = tmpDir("emb_stage")
    batch.coalesce(1).write.mode("overwrite").parquet(staged)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      .toArray.map(_.toString).find(_.endsWith(".parquet")).get
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(streamDir, "arrivals.parquet"))

    val stream = DocStreams.readEmbeddings(s, streamDir)
    val cand = DocStreams.semanticCandidates(stream, idxPath, tau = 0.4)
    DocStreams.confirmSemanticDedup(cand, s"$outDir/pruned", tmpDir("sem_ckpt"))

    val got = s.read.parquet(s"$outDir/pruned")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.Dedup
      .semanticDedupAgainst(corpus, batch, tau = 0.4)
      .filter(!col("keep"))
      .collect().map(r => (r.getAs[Long]("vid"), r.getAs[Long]("witness"))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("streaming IVFPQ ingest: grown index answers searches like the batch append") {
    val s = spark
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 400)
    val wave = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    val cbooks = graft.operators.Similarity
      .pqSubvecs(emb.filter(col("vec_id") < 16), 8, 8, "vec_id", "embedding")
      .select(col("vec_id").cast("int").as("cid"), col("m"),
        col("sv").as("cv"))

    def build(path: String): Unit = {
      val baseCodes = graft.operators.Similarity.pqEncode(base, cbooks)
      graft.operators.Similarity.writeIvfPqIndex(baseCodes, cbooks, path)
    }
    // batch-appended twin
    val batchIdx = tmpDir("ivfpq_batch")
    build(batchIdx)
    graft.operators.Similarity.appendToIvfPqIndex(wave, batchIdx)

    // streaming-ingested index: wave arrives as a file stream
    val streamIdx = tmpDir("ivfpq_stream")
    build(streamIdx)
    val streamDir = tmpDir("ivfpq_arrivals")
    val staged = tmpDir("ivfpq_stage")
    wave.coalesce(1).write.mode("overwrite").parquet(staged)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      .toArray.map(_.toString).find(_.endsWith(".parquet")).get
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(streamDir, "arrivals.parquet"))
    val ckpt = tmpDir("ivfpq_ckpt")
    DocStreams.ingestIvfPq(DocStreams.readEmbeddings(s, streamDir),
      streamIdx, ckpt)

    def topk(path: String) = graft.operators.Similarity
      .adcIvfTopKIndexed(s, path, queries, k = 5)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaStream = topk(streamIdx)
    assert(viaStream.nonEmpty && viaStream == topk(batchIdx))
    // the stream actually grew the index
    assert(s.read.parquet(
      graft.sources.EpochDir.live(s, s"$streamIdx/codes"))
      .select("vid").distinct().count() == emb.count())

    // EXACTLY-ONCE under replay: crash between the parquet write and
    // the checkpoint commit = the commit file is missing but the batch
    // data landed. Simulate it by deleting the batch's commit marker
    // and restarting from the same checkpoint — Spark re-runs batch 0
    // against an index that already contains its rows. The idempotent
    // `_batch=<id>` dynamic overwrite must leave zero duplicate
    // (vid, m) code rows and an unchanged search result.
    val ckptPath = ckpt
    // delete through Hadoop's FS so the .crc sibling goes too — a
    // stale checksum would fail the replay's rename-commit
    val ckptFs = new org.apache.hadoop.fs.Path(ckptPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val commit0 = new org.apache.hadoop.fs.Path(s"$ckptPath/commits/0")
    assert(ckptFs.exists(commit0), s"no commit marker at $commit0")
    assert(ckptFs.delete(commit0, false))
    DocStreams.ingestIvfPq(DocStreams.readEmbeddings(s, streamDir),
      streamIdx, ckptPath)
    val codeRows = s.read.parquet(
      graft.sources.EpochDir.live(s, s"$streamIdx/codes"))
    val dups = codeRows.groupBy("vid", "m")
      .count().filter(col("count") > 1).count()
    assert(dups == 0L, s"replayed batch left $dups duplicate (vid, m) rows")
    assert(topk(streamIdx) == viaStream)
  }

  test("streaming near-dups against the band index == batch incremental dedup") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val idxT = graft.model.TableRef("graft_test", "stream_band_idx")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val streamDir = tmpDir("doc_stream")
    val outDir = tmpDir("dup_out")
    try {
      Dedup.writeBandIndex(corpus, "doc_id", "text", idxT)
      // stage the arriving batch as one flat parquet file
      val staged = tmpDir("doc_stage")
      batch.coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, "arrivals.parquet"))

      val stream = DocStreams.readDocs(s, streamDir)
      val cand = DocStreams.nearDupCandidates(stream, idxT.qualified)
      DocStreams.confirmNearDups(cand, docs, 0.5,
        s"$outDir/pairs", tmpDir("dup_ckpt"))

      val got = s.read.parquet(s"$outDir/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Dedup.minhashNearDupsAgainst(
        batch, corpus, "doc_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty && got == want)
    } finally CatalogOps.dropEpochIndex(s, idxT)
  }

  test("streaming contamination gate against the shingle index == batch operator") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val idxT = graft.model.TableRef("graft_test", "stream_shingle_idx")
    val train = docs.filter(col("doc_id") < 400)
    val arriving = docs.filter(col("doc_id") >= 400)
    val streamDir = tmpDir("contam_stream")
    val outDir = tmpDir("contam_out")
    try {
      Dedup.writeShingleIndex(train, "doc_id", "text", idxT)
      val staged = tmpDir("contam_stage")
      arriving.coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, "arrivals.parquet"))

      val cand = DocStreams.contaminationCandidates(
        DocStreams.readDocs(s, streamDir), idxT)
      DocStreams.confirmContamination(cand, outDir, tmpDir("contam_ckpt"))

      def asSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val got = asSet(s.read.parquet(outDir))
      val want = asSet(Dedup.contaminationAgainstIndex(
        arriving, "doc_id", "text", idxT))
      assert(got.nonEmpty && got == want)
      // the gate actually discriminates: some docs share train shingles
      assert(got.exists(_._3 > 0L))
    } finally CatalogOps.dropEpochIndex(s, idxT)
  }

  test("streaming quality gate keeps exactly the batch query's rows") {
    val s = spark
    val streamDir = tmpDir("qs_stream")
    val outDir = tmpDir("qs_out")
    // two arrival waves so the keep decision is proven per-batch stable
    for ((lo, hi, name) <- Seq((0L, 250L, "wave1"), (250L, 500L, "wave2"))) {
      val staged = tmpDir(s"qs_stage_$name")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    val q = DocStreams.qualitySampled(DocStreams.readDocs(s, streamDir))
      .writeStream
      .option("checkpointLocation", tmpDir("qs_ckpt"))
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "bucket", "score", "band").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val got = asSet(s.read.parquet(outDir))
    val want = asSet(graft.SparkEntry.queries("t_quality_sample")(s, sf0001))
    assert(got.nonEmpty && got == want)
    // the gate discriminates: not everything survives, >1 bucket appears
    assert(got.size < docs.count())
    assert(got.map(_._2).size >= 1 && Set("head", "middle", "tail")
      .exists(b => got.exists(_._2 == b)))
  }

  test("streaming exemplar reservoir converges to the batch t_eval_sample") {
    val s = spark
    val streamDir = tmpDir("ev_stream")
    // two waves in REVERSE id order: the reservoir merge must be
    // arrival-order-insensitive for the final state to match batch
    for ((lo, hi, name) <- Seq((250L, 500L, "wave1"), (0L, 250L, "wave2"))) {
      val staged = tmpDir(s"ev_stage_$name")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    val stream = s.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val q = DocStreams.evalSampled(stream)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory").queryName("ev_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // per stratum keep only the max-ver (latest) emission
    val all = s.sql("SELECT lang, bucket, ver, rk, doc_id FROM ev_out")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getInt(3).toLong, r.getLong(4))))
    assert(all.exists(_._2._1 > 1L),
      "maxFilesPerTrigger=1 must produce multiple state versions")
    val got = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val vmax = rows.map(_._2._1).max
      rows.filter(_._2._1 == vmax).map { case ((l, b), (_, rk, id)) =>
        (l, b, rk, id) }.toSeq
    }.toSet
    val want = graft.SparkEntry.queries("t_eval_sample")(s, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2).toLong,
        r.getLong(3)))
      .toSet
    assert(got.nonEmpty && got == want,
      s"final reservoir state must equal the batch sample:\n" +
        s"got ${got.toSeq.sorted.take(8)}…\nwant ${want.toSeq.sorted.take(8)}…")
  }

  test("streaming DSIR gate keeps exactly the docs the batch scores in") {
    val s = spark
    import org.apache.spark.sql.functions._
    // train the 64-bucket weight table exactly as t_dsir does (model
    // state: one aggregate, collected)
    val feats = docs.select(col("doc_id"), col("lang"),
        explode(graft.operators.TextAnalysis.wordBigrams(col("text")))
          .as("bg"))
      .select(col("doc_id"), col("lang"),
        graft.operators.TextAnalysis.dsirBucket(col("bg")).as("f"))
    val weights = feats.groupBy("f")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      .select(col("f"), expr("((ct + 1) * 1000000) div (cr + 1)").as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // batch truth: per-doc integer mean feature weight via the
    // distributed formulation; threshold = the median score, so the
    // gate provably discriminates (some in, some out)
    val scores = feats
      .join(feats.sparkSession.createDataFrame(weights.toSeq)
        .toDF("f", "w"), "f")
      .groupBy("doc_id").agg(count(lit(1)).as("nf"), sum("w").as("sw"))
      .select(col("doc_id"), expr("sw div nf").as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val thr = scores.map(_._2).sorted.apply(scores.length / 2)
    val want = scores.filter(_._2 >= thr).toMap
    // stream the same corpus in two waves through the stateless gate
    val streamDir = tmpDir("dsir_stream")
    val outDir = tmpDir("dsir_out")
    for ((lo, hi, name) <- Seq((0L, 250L, "wave1"), (250L, 500L, "wave2"))) {
      val staged = tmpDir(s"dsir_stage_$name")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    val q = DocStreams.importanceGated(
        DocStreams.readDocs(s, streamDir), weights, thr)
      .writeStream
      .option("checkpointLocation", tmpDir("dsir_ckpt"))
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = s.read.parquet(outDir).select("doc_id", "dsir_e6")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == want)
    // the gate discriminates (threshold sits inside the score range)
    assert(got.size < docs.count())
  }

  test("streaming chunker emits exactly the batch query's chunks") {
    val s = spark
    val streamDir = tmpDir("ck_stream")
    val outDir = tmpDir("ck_out")
    for ((lo, hi, name) <- Seq((0L, 250L, "wave1"), (250L, 500L, "wave2"))) {
      val staged = tmpDir(s"ck_stage_$name")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    val q = DocStreams.chunked(DocStreams.readDocs(s, streamDir))
      .writeStream
      .option("checkpointLocation", tmpDir("ck_ckpt"))
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "chunk_id", "start", "len", "chunk_fp").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4)))
        .toSet
    val got = asSet(s.read.parquet(outDir))
    val want = asSet(graft.SparkEntry.queries("t_chunk")(s, sf0001))
    assert(got.nonEmpty && got == want)
    // long docs really split: at least one doc yields multiple chunks
    assert(got.groupBy(_._1).exists(_._2.size > 1))
  }

  test("streaming unigram tokenization == the oracle-checked batch encode") {
    // The tokenizer's stream twin: train offline (the same 64/4/3
    // hyper-parameters the t_unigram_* queries publish), then arriving
    // docs tokenize themselves with a PER-ROW Viterbi fold — stateless
    // map-only, so two arrival waves must reproduce the batch query's
    // per-document token accounting row for row.
    val s = spark
    val model = graft.operators.Unigram.train(docs, "text",
      topK = 64, maxPiece = 4, rounds = 3)
    val streamDir = tmpDir("tok_stream")
    val outDir = tmpDir("tok_out")
    for ((lo, hi, name) <- Seq((0L, 250L, "wave1"), (250L, 500L, "wave2"))) {
      val staged = tmpDir(s"tok_stage_$name")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    val q = DocStreams.tokenized(DocStreams.readDocs(s, streamDir),
        model, maxPiece = 4)
      .writeStream
      .option("checkpointLocation", tmpDir("tok_ckpt"))
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_words", "n_tokens", "tokens_per_word")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val got = asSet(s.read.parquet(outDir))
    val want = asSet(graft.SparkEntry.queries("t_unigram_encode")(s, sf0001))
    assert(got.size == 500 && got == want)
  }

  test("streaming tokenization of OOV text: floor-scored singles, never null rows") {
    // The stream applies a TRAINED model to ARRIVING text, where
    // characters the training corpus never saw are plausible. Before
    // the Laplace-floor fallback, an OOV character nulled the whole
    // word's DP and the stream silently emitted null n_words/n_tokens
    // rows; now OOV chars segment as their own floor-scored pieces.
    val s = spark
    import s.implicits._
    val model = graft.operators.Unigram.train(
      Seq("ab ab ab").toDF("text"), "text", topK = 64, maxPiece = 4,
      rounds = 3) // vocabulary: {ab, a, b} — anything else is OOV
    val streamDir = tmpDir("tok_oov_stream")
    val staged = tmpDir("tok_oov_stage")
    Seq(
      (1L, "ab ab", "en", "s", 5L),     // fully in-vocab: 2 words, 2 pieces
      (2L, "axb zz ab", "en", "s", 9L), // OOV x and z: a|x|b, z|z, ab
      (3L, "qqq", "en", "s", 3L))       // entirely OOV: q|q|q
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      .toArray.map(_.toString).find(_.endsWith(".parquet")).get
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(streamDir, "wave.parquet"))
    val outDir = tmpDir("tok_oov_out")
    val q = DocStreams.tokenized(DocStreams.readDocs(s, streamDir),
        model, maxPiece = 4)
      .writeStream
      .option("checkpointLocation", tmpDir("tok_oov_ckpt"))
      .format("parquet").option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = s.read.parquet(outDir)
      .select("doc_id", "n_words", "n_tokens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      1L -> ((2L, 2L)),   // ab, ab
      2L -> ((3L, 6L)),   // a x b | z z | ab
      3L -> ((1L, 3L))),  // q q q
      s"OOV docs must tokenize, not null out: $got")
  }

  test("streaming dq drift monitor: healthy wave silent, drifted wave flagged per batch") {
    val s = spark
    import s.implicits._
    val streamDir = tmpDir("dq_stream")
    val outDir = tmpDir("dq_out")
    // baseline: the batch profile of the healthy FULL corpus (model
    // state) — covering the id/bounds domain arriving batches draw from
    val baseline = graft.operators.DataQuality.collectProfile(docs)
    // wave 1 healthy; wave 2 DRIFTED — lang nulls out on half the rows
    // (completeness drop) and n_chars goes negative (min_bound escape)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val staged = tmpDir(s"dq_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    stage(docs.filter(col("doc_id") >= 250 && col("doc_id") < 400), "wave1")
    stage(docs.filter(col("doc_id") >= 400)
      .withColumn("lang",
        when(col("doc_id") % 2 === 0, lit(null)).otherwise(col("lang")))
      .withColumn("n_chars",
        when(col("doc_id") % 7 === 0, lit(-100000L))
          .otherwise(col("n_chars"))),
      "wave2")
    // one file per micro-batch so the healthy wave's silence is a real
    // per-batch verdict, not averaged away inside one big batch
    val src = s.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    DocStreams.dqDriftMonitor(src,
      baseline, tolerance = 0.1, outDir, tmpDir("dq_ckpt"))
    val findings = s.read.parquet(outDir)
      .select("column", "metric").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(findings.contains(("lang", "completeness")),
      s"the lang completeness drop must flag: $findings")
    assert(findings.contains(("n_chars", "min_bound")),
      s"the negative n_chars must flag: $findings")
    // size-dependent cardinality never fires on a micro-batch, and the
    // healthy wave contributes nothing
    assert(!findings.exists(_._2 == "approx_distinct"), findings.toString)
    val byBatch = s.read.parquet(outDir).select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(byBatch.size == 1, s"only the drifted batch may flag: $byBatch")
  }

  test("streaming dq drift monitor: PSI shape rule flags a same-bounds collapse per batch") {
    val s = spark
    val streamDir = tmpDir("dqp_stream")
    val outDir = tmpDir("dqp_out")
    val corpus = docs.filter(col("doc_id") < 250)
    val baseline = graft.operators.DataQuality.collectProfile(docs)
    val psiBase = graft.operators.DataQuality
      .collectHistograms(corpus, Seq("n_chars"), bins = 10)
    assert(psiBase.nonEmpty)
    val hi = psiBase.head.hi
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val staged = tmpDir(s"dqp_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    // wave 1: the EXACT baseline rows — PSI 0 by construction, silent.
    stage(corpus, "wave1")
    // wave 2: every n_chars collapsed INSIDE the baseline range (hi−1)
    // — bounds/completeness provably silent, shape obliterated
    stage(docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
      .withColumn("n_chars", lit((hi - 1).toLong)), "wave2")
    DocStreams.dqDriftMonitor(
      s.readStream.schema(DocStreams.docSchema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir),
      baseline, tolerance = 0.1, outDir, tmpDir("dqp_ckpt"),
      psiBaseline = psiBase, psiThreshold = 0.2)
    val rows = s.read.parquet(outDir)
      .select("batch_id", "column", "metric").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set((1L, "n_chars", "psi")),
      s"exactly the collapsed batch must flag, psi-only: ${rows.toSeq}")
  }

  test("streaming dq drift monitor: forced replay leaves zero duplicate findings") {
    val s = spark
    val streamDir = tmpDir("dqr_stream")
    val outDir = tmpDir("dqr_out")
    val ckpt = tmpDir("dqr_ckpt")
    val baseline = graft.operators.DataQuality.collectProfile(docs)
    // one healthy wave, one drifted wave, one file per micro-batch —
    // the replayed batch must be one that actually WROTE findings
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val staged = tmpDir(s"dqr_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(staged)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
        .toArray.map(_.toString).find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(streamDir, s"$name.parquet"))
    }
    stage(docs.filter(col("doc_id") >= 250 && col("doc_id") < 400), "wave1")
    stage(docs.filter(col("doc_id") >= 400)
      .withColumn("lang",
        when(col("doc_id") % 2 === 0, lit(null)).otherwise(col("lang"))),
      "wave2")
    def run(): Unit = DocStreams.dqDriftMonitor(
      s.readStream.schema(DocStreams.docSchema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir),
      baseline, tolerance = 0.1, outDir, ckpt)
    run()
    val before = s.read.parquet(outDir)
      .select("batch_id", "column", "metric", "baseline", "current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(before.nonEmpty, "the drifted wave must have written findings")
    // crash between the parquet write and the checkpoint commit: the
    // findings landed but the commit marker is gone — Spark replays
    // the last batch against an outDir already holding its rows. The
    // _batch dynamic overwrite must leave the findings table
    // bit-identical, never doubled (the old plain append duplicated
    // that batch's alerts here).
    val ckptFs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val lastCommit = new org.apache.hadoop.fs.Path(s"$ckpt/commits/1")
    assert(ckptFs.exists(lastCommit), s"no commit marker at $lastCommit")
    assert(ckptFs.delete(lastCommit, false))
    run()
    val after = s.read.parquet(outDir)
      .select("batch_id", "column", "metric", "baseline", "current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(after.sorted == before.sorted,
      s"replay changed the findings table: before=$before after=$after")
    val dups = s.read.parquet(outDir)
      .groupBy("batch_id", "column", "metric")
      .count().filter(col("count") > 1).count()
    assert(dups == 0L, s"replayed batch left $dups duplicate findings rows")
  }
}
