package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, TextAnalysis}

/** CONTINUOUS incremental dedup: documents arriving as a file stream
  * are checked against the standing corpus band index
  * ([[graft.operators.Dedup.writeBandIndex]]) as they land — the
  * streaming face of `d_incremental`.
  *
  * Pipeline shape (and why it is streaming-legal):
  *  1. arriving docs band themselves with
  *     [[graft.operators.Dedup.mapOnlyBands]] — pure per-row
  *     projections, no state, no aggregation before the join;
  *  2. band keys join the PERSISTED index STREAM-STATIC (inner) — the
  *     allowed-everywhere join kind; the bucketed index side never
  *     shuffles;
  *  3. candidate (arriving, corpus) pairs flow into `foreachBatch`,
  *     where each micro-batch (a plain DataFrame) pays candidate
  *     dedup + exact-Jaccard verification against the static document
  *     store via the same candidate-keyed joins as the batch operator —
  *     work bounded by the batch's own candidates.
  * At 100 TB the corpus index grows by appending each verified batch's
  * bands; arriving data never triggers a corpus-sized recomputation.
  */
object DocStreams {

  /** File-source schema of the documents table. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open a documents directory as a file stream. */
  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  /** Stage 1+2: map-only bands of the arriving docs, stream-static
    * joined against the persisted band index. Output has one row per
    * (arriving doc, corpus doc, matching band) — candidate pairs, with
    * per-band duplicates still present (dedup needs state; it happens
    * per micro-batch in [[confirmNearDups]]).
    */
  def nearDupCandidates(stream: DataFrame, indexTable: String,
      bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val spark = stream.sparkSession
    Dedup.mapOnlyBands(stream, "doc_id", "text", bands, rowsPerBand).as("x")
      .join(spark.table(indexTable).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
  }

  /** File-source schema of the embeddings table. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Open an embeddings directory as a file stream. */
  def readEmbeddings(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(path)

  /** CONTINUOUS semantic dedup — the streaming face of
    * `d_semantic_incremental`, shaped like [[nearDupCandidates]]:
    *  1. arriving vectors assign their cell with the ZERO-exchange
    *     [[graft.operators.Similarity.assignCellsMapOnly]] (centroids
    *     are collected model state from the persisted index — the
    *     aggregation-based assignment is illegal before a
    *     stream-static join in append mode);
    *  2. the assignment joins the index's `cells` table STREAM-STATIC
    *     on cell — candidates are batch×(touched cells), never
    *     batch×corpus;
    *  3. the codegen-float prefilter AND the exact-decimal cosine
    *     threshold both run IN-STREAM (stateless projections — unlike
    *     the Jaccard pipeline, similarity needs no corpus-side
    *     aggregation), so only the per-vector min-witness reduction
    *     is left to [[confirmSemanticDedup]]'s micro-batch.
    * Output: (vid, witness, cos) candidate rows, tau-confirmed.
    */
  def semanticCandidates(stream: DataFrame, indexPath: String,
      tau: Double): DataFrame = {
    import graft.plans.FloatVecOps.{floatDot, floatNorm2}
    import graft.operators.Similarity
    val spark = stream.sparkSession
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    val arriving = Similarity.assignCellsMapOnly(stream, cents)
      .select(col("vid"), col("cell"), col("cvec").as("vb"),
        sqrt(floatNorm2(col("cvec"))).as("nb"))
    val corpus = spark.read.parquet(
      graft.sources.EpochDir.live(spark, s"$indexPath/cells"))
      .select(col("cell"), col("vid").as("witness"), col("cvec").as("va"),
        sqrt(floatNorm2(col("cvec"))).as("na"))
    val cheap = round(floatDot(col("va"), col("vb")) / (col("na") * col("nb")), 8)
    arriving.join(corpus, Seq("cell"))
      .filter(cheap >= lit(tau - 0.01))
      .select(col("vid"), col("witness"),
        Similarity.cosineExact(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Terminal reduction of [[semanticCandidates]]: per arriving vector,
    * the smallest τ-similar corpus witness — a per-micro-batch groupBy
    * (an arriving vector's candidates all live in its own micro-batch,
    * so the per-batch min IS the global min). Confirmed (vid, witness)
    * rows append to `outDir`.
    */
  def confirmSemanticDedup(candidates: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery = {
    val q = candidates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy("vid")
          .agg(min(col("witness")).as("witness"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CONTINUOUS IVFPQ index ingestion — the streaming face of
    * [[graft.operators.Similarity.appendToIvfPqIndex]]: each arriving
    * micro-batch of vectors is PQ-encoded against the index's STORED
    * codebooks and cell-assigned against its STORED coarse centroids
    * (both invariants of the standing index — codes and cells must not
    * move on ingest), then appended into the partitionBy(cell) code
    * layout. The append is wholly inside foreachBatch because the
    * encode path aggregates (argmin over subspaces) — illegal as a
    * pre-sink streaming transform in append mode, and unnecessary:
    * per-batch encode state is the batch itself. Searches against the
    * growing index ([[graft.operators.Similarity.adcIvfTopKIndexed]])
    * see every ingested batch; spec-proven equal to the batch append
    * (DocStreamsSpec). Compact periodically
    * ([[graft.operators.Similarity.compactIvfPqIndex]]) — each batch
    * lands its own files per touched cell.
    *
    * Delivery contract: EXACTLY-ONCE by idempotence. Each micro-batch
    * writes its code rows under its own `cell=<c>/_batch=<id>/` leaf
    * via dynamic partition overwrite
    * ([[graft.operators.Similarity.appendToIvfPqIndex]] with the
    * streaming batch id), so a batch REPLAYED after a crash between
    * the parquet write and the checkpoint commit OVERWRITES exactly
    * its own leaves with identical rows (the encode is deterministic
    * against the stored codebooks) instead of appending duplicates —
    * spec-proven by a forced replay-from-checkpoint in DocStreamsSpec.
    * PQ geometry is read off the index's stored codebooks, never
    * caller-supplied.
    */
  def ingestIvfPq(stream: DataFrame, indexPath: String,
      checkpoint: String): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.appendToIvfPqIndex(
          batch, indexPath, batchId = Some(batchId))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CONTINUOUS contamination gate — the streaming face of
    * `t_contamination_incremental`, shaped like [[nearDupCandidates]]:
    * arriving documents shingle themselves MAP-ONLY
    * ([[graft.operators.Dedup.shingleRelation]] is pure projections +
    * explode — stateless, append-legal), then LEFT stream-static join
    * the persisted train-shingle index (the bucketed side never
    * shuffles; the read-side distinct rides the bucket layout) with a
    * hit marker carried for the misses. Output: one row per (arriving
    * doc, distinct shingle) with `hit` ∈ {1, null} — the per-document
    * rollup needs aggregation, so it happens per micro-batch in
    * [[confirmContamination]] (an arriving doc's shingles all live in
    * its own micro-batch, so per-batch counts ARE the global counts).
    */
  def contaminationCandidates(stream: DataFrame,
      indexTable: graft.model.TableRef): DataFrame = {
    val spark = stream.sparkSession
    // the index name is an epoch VIEW (CatalogOps.publishEpoch):
    // resolution pins an immutable epoch table, so a compaction during
    // the stream can never tear a micro-batch's read
    val train = spark.table(indexTable.qualified)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    Dedup.shingleRelation(stream, "doc_id", "text")
      .join(train, Seq("shingle"), "left")
      .select(col("id"), col("hit"))
  }

  /** Terminal rollup of [[contaminationCandidates]]: per arriving
    * document, total distinct shingles, train-shared count, and the
    * contamination ratio — `t_contamination`'s output contract.
    * Appends to `outDir`; spec-proven equal to the batch
    * [[graft.operators.Dedup.contaminationAgainstIndex]]
    * (DocStreamsSpec).
    */
  def confirmContamination(candidates: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery = {
    val q = candidates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy("id")
          .agg(count(lit(1)).as("total"),
            sum(coalesce(col("hit"), lit(0))).cast("long").as("shared"))
          .select(col("id").as("doc_id"), col("total"), col("shared"),
            round(col("shared").cast("double") /
              col("total").cast("double"), 6).as("contam_ratio"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CONTINUOUS quality-bucket sampling — the streaming face of
    * `t_quality_sample`: arriving documents score, bucket, and decide
    * their own fate with the same fixed thresholds and deterministic
    * 256-band keep as the batch query
    * ([[graft.operators.TextAnalysis.qualityBucket]] /
    * [[graft.operators.TextAnalysis.qualityKeep]]). Entirely stateless
    * map-only projections, so the stream needs no watermark, no state
    * store, and no foreachBatch — a plain append sink is exactly-once
    * at the row level because a replayed document reproduces the
    * identical keep decision (its fate depends only on its own id and
    * text, never on what else has arrived). Spec-proven to keep the
    * same rows as the batch query (DocStreamsSpec).
    */
  /** CONTINUOUS context-window chunking — the streaming face of
    * `t_chunk`: arriving documents explode into their 64/48 training
    * windows as they land ([[graft.operators.TextAnalysis.chunkWindows]]
    * — the SAME projection as the batch query). Stateless map-only, so
    * no watermark, no state store, no foreachBatch; a plain append
    * sink is row-level idempotent by the [[qualitySampled]] argument —
    * a replayed document reproduces byte-identical chunks because its
    * boundaries and fingerprints depend only on its own text.
    * Spec-proven to emit exactly the batch query's rows
    * (DocStreamsSpec).
    */
  def chunked(stream: DataFrame, win: Int = 64, stride: Int = 48,
      minTail: Int = 32): DataFrame =
    TextAnalysis.chunkWindows(stream, "doc_id", "text", win, stride,
      minTail).withColumnRenamed("id", "doc_id")

  /** CONTINUOUS few-shot exemplar maintenance — the streaming face of
    * the batch `t_eval_sample`: each (lang × quality-bucket) stratum
    * keeps the k smallest (salted-md5, id) pairs as keyed state (the
    * bottom-k reservoir as a stream fold; O(k) longs per stratum, the
    * ReservoirSketch merge run incrementally), and after every
    * micro-batch that touches it re-emits its CURRENT exemplar list in
    * id order with a monotone `ver` stamp — downstream keeps the
    * max-`ver` rows per stratum and always holds the latest eval set.
    * Once all documents have arrived, the final emission per stratum
    * equals the batch query on the full corpus for ANY arrival order
    * and ANY micro-batch split (the merge is order-insensitive —
    * spec-proven across waves). Update-mode stateful: requires
    * `OutputMode.Update` (memory/foreachBatch sinks).
    */
  def evalSampled(stream: DataFrame, k: Int = 3): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val rows = stream.select(
        col("lang"),
        TextAnalysis.qualityBucket(col("text")).as("bucket"),
        // fused md5-prefix — same value as the conv/substring chain
        graft.plans.HashOps.md5PrefixLong(
          concat(lit("ev:"), col("doc_id").cast("string")), 1, 8).as("h"),
        col("doc_id"))
      .as[(String, String, Long, Long)]
    rows.groupByKey { case (lang, bucket, _, _) => (lang, bucket) }
      .mapGroupsWithState[(Long, Seq[(Long, Long)]),
        (String, String, Long, Seq[Long])](GroupStateTimeout.NoTimeout) {
        case ((lang, bucket), it, state) =>
          val (ver, cur) = state.getOption.getOrElse((0L, Seq.empty))
          val merged = (cur ++ it.map(r => (r._3, r._4))).sorted.take(k)
          state.update((ver + 1, merged))
          (lang, bucket, ver + 1, merged.map(_._2).sorted)
      }
      .toDF("lang", "bucket", "ver", "ids")
      .select(col("lang"), col("bucket"), col("ver"),
        posexplode(col("ids")).as(Seq("p", "doc_id")))
      .select(col("lang"), col("bucket"), col("ver"),
        (col("p") + 1).as("rk"), col("doc_id"))
  }

  def qualitySampled(stream: DataFrame): DataFrame =
    stream
      .select(col("doc_id"),
        TextAnalysis.qualityBucket(col("text")).as("bucket"),
        TextAnalysis.qualityScore(col("text")).as("score"),
        TextAnalysis.hashBand256(col("doc_id"), "qb:").as("band"))
      .filter(TextAnalysis.qualityKeep(col("doc_id"), col("bucket")))

  /** CONTINUOUS DSIR importance gate: arriving documents score
    * themselves against the trained 64-bucket weight table (model
    * state from the batch `t_dsir` aggregate — the same offline-model
    * / online-detector split as the CUSUM and IVFPQ streams) and keep
    * only rows whose integer mean feature weight clears `threshold`.
    * Stateless map-only: a document's fate depends only on its own
    * text + the frozen weights, so delivery is row-level exactly-once
    * under replay with no watermark, state store, or foreachBatch —
    * the qualitySampled shape. Featureless documents (<2 tokens) carry
    * no evidence and are dropped.
    */
  def importanceGated(stream: DataFrame, weights: Map[Int, Long],
      threshold: Long): DataFrame =
    stream
      .select(col("doc_id"), col("lang"),
        TextAnalysis.dsirWeights(col("text"), weights).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("lang"), size(col("ws")).as("nf"),
        aggregate(col("ws"), lit(0L), (a, v) => a + v).as("sw"))
      .select(col("doc_id"), col("lang"), col("nf"),
        expr("sw div nf").as("dsir_e6"))
      .filter(col("dsir_e6") >= threshold)

  /** CONTINUOUS tokenization: arriving documents tokenize themselves
    * against a TRAINED unigram model
    * ([[graft.operators.Unigram.viterbiSeg]] over the model's literal
    * probability map), emitting the batch `t_unigram_encode` row shape
    * per document. Stateless map-only: the per-document token count is
    * a PER-ROW fold over the document's own words — no explode, no
    * aggregation, no state — so delivery is row-level exactly-once
    * under replay with no watermark or state store (the qualitySampled
    * shape). The offline/online split mirrors the DSIR and CUSUM
    * streams: training (EM over the distinct-word table) happens in
    * batch; the stream pays per-token Viterbi compute in exchange for
    * statelessness, where the batch twin amortizes the fold over
    * DISTINCT words. Spec-proven equal to the oracle-checked batch
    * query across arrival waves (DocStreamsSpec).
    */
  def tokenized(stream: DataFrame,
      model: graft.operators.Unigram.Model, maxPiece: Int): DataFrame = {
    val vm = typedLit(model.probs.toMap)
    val toks = split(col("text"), " ")
    val nTok = aggregate(
      transform(toks, w =>
        size(split(graft.operators.Unigram.viterbiSeg(w, vm, maxPiece,
          lit(model.unkProb)), " ")).cast("long")),
      lit(0L), (acc, x) => acc + x)
    stream.select(col("doc_id"),
      size(toks).cast("long").as("n_words"), nTok.as("n_tokens"))
      .withColumn("tokens_per_word",
        round(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6))
  }

  /** Stage 3: per-micro-batch candidate dedup + exact-Jaccard
    * verification against the static `docStore` (which must contain
    * both the corpus and the arriving documents' text — in production,
    * the document table the stream is also appended to). Confirmed
    * pairs (id_a, id_b, jac) append to `outDir` as parquet.
    */
  def confirmNearDups(candidates: DataFrame, docStore: DataFrame,
      threshold: Double, outDir: String, checkpoint: String): StreamingQuery = {
    val q = candidates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cand = batch.distinct()
        val rel = Dedup.shingleRelation(docStore, "doc_id", "text")
        Dedup.jaccardForCandidates(rel, cand, threshold)
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** CONTINUOUS data-quality drift monitor — the streaming twin of
    * `MigrateCli --mode dq --baseline`
    * ([[graft.operators.DataQuality.drift]]): every micro-batch
    * profiles itself in ONE pass (`collectProfile` — output bounded by
    * schema width, never row data) and diffs against the FIXED
    * baseline profile, which is MODEL STATE — the batch dq report of
    * the known-healthy corpus (the same offline-model /
    * online-detector split as the CUSUM and DSIR streams). Findings
    * rows (batch_id, column, metric, baseline, current) append to
    * `outDir`; an empty batch of findings means the arriving data is
    * healthy — the pipeline alerts on the findings table.
    *
    * Only SIZE-INDEPENDENT metrics participate — presence,
    * completeness, numeric bounds. A micro-batch's cardinality is
    * batch-sized by construction, so the approx_distinct rule (whose
    * semantics are same-size run-over-run) would false-alarm against a
    * corpus baseline and is dropped here. Stateless per batch: a
    * batch's verdicts depend only on its own rows + the frozen
    * baseline, so replay re-derives identical findings.
    *
    * `psiBaseline` (optional) arms the SHAPE rule
    * ([[graft.operators.DataQuality.psiDrift]]): each batch's values
    * bin on the BASELINE bounds and the population-stability index
    * gates at `psiThreshold` — the same-bounds distribution collapse
    * the other rules provably miss. Proportions are size-independent,
    * so a corpus-baseline compare is valid per batch; small batches
    * read noisier PSI — size the threshold to the trigger's batch
    * volume (the 0.2 default assumes hundreds of rows per batch).
    *
    * Delivery contract: EXACTLY-ONCE by idempotence — the same
    * `_batch=<id>` dynamic-partition-overwrite recipe as
    * [[ingestIvfPq]]. Each micro-batch lands its findings under its
    * own `_batch` leaf, so a batch REPLAYED after a crash between the
    * parquet write and the checkpoint commit OVERWRITES its own leaf
    * with the identical re-derived rows instead of appending duplicate
    * alerts (a plain append would double that batch's findings on
    * replay). A replayed batch with ZERO findings is a no-op either
    * way — dynamic overwrite with no partitions deletes nothing, and
    * a healthy batch never wrote a leaf to begin with.
    */
  def dqDriftMonitor(stream: DataFrame,
      baseline: Seq[graft.operators.DataQuality.ColumnProfile],
      tolerance: Double, outDir: String,
      checkpoint: String,
      psiBaseline: Seq[graft.operators.DataQuality.HistProfile] = Nil,
      psiThreshold: Double = 0.2): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val prof = graft.operators.DataQuality.collectProfile(batch)
        val findings = (graft.operators.DataQuality
          .drift(baseline, prof, tolerance)
          .filterNot(_.metric == "approx_distinct") ++
          graft.operators.DataQuality
            .psiDrift(psiBaseline, batch, psiThreshold))
          .map(d => (batchId, d.column, d.metric, d.baseline, d.current))
        findings
          .toDF("batch_id", "column", "metric", "baseline", "current")
          .withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch")
          .parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
