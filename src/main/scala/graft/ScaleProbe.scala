package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic probe for the SCALING.md sf-ratio investigation: measures
  * LSH candidate-pair counts and per-stage timings at a given SF dir so
  * super-linear bench ratios can be attributed to candidate growth vs
  * shuffle/memory effects. Not part of the library surface.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("all")
    val parts = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}
    import graft.sources.Sources

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // Like explain: but with broadcast joins disabled — shows the
    // exchange keys a too-big-to-broadcast build side would shuffle on
    // (the plan shape that matters at 100 TB, which small-SF AQE hides
    // behind BroadcastHashJoin).
    if (what.startsWith("explainNoBc:")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val q = what.stripPrefix("explainNoBc:")
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.explain("formatted")
    }
    if (what.startsWith("explain:")) {
      val q = what.stripPrefix("explain:")
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.explain("formatted")
      timed(q)(df.count())
      // AQE finalizes the plan during execution; the formatted explain
      // above shows only the initial plan, so dump the executed one too.
      println("=== executed plan (post-AQE) ===")
      println(df.queryExecution.executedPlan.toString.take(60000))
    }
    // Law-bearing COUNTS (not timings) at one SF dir: the quantities the
    // 100 TB claims say track the corpus linearly. Run at each scale
    // decade and ratio the counts — a wall-clock ratio says how this BOX
    // behaved; a candidate-count ratio is the algorithm's law itself,
    // host-independent. Prints one JSON line.
    if (what == "lawcounts") {
      val docs = Sources.table(spark, sfDir, "documents")
      val nDocs = docs.count()
      val rel = Dedup.shingleRelation(docs, "doc_id", "text")
      val nShingle = rel.count()
      // d_minhash's exact stages: 6 bands x 2 rows, verify at 0.5
      val nCand = Dedup.lshCandidates(Dedup.bandsFromRelation(rel, 6, 2)).count()
      val nPairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.5).count()
      val e = Sources.table(spark, sfDir, "embeddings")
      val nEmb = e.count()
      // s_embed_neardup_scaled's candidate stage under the geometry
      // chooseGeometry picks for THIS corpus size (the query's budget law)
      val geom = Similarity.chooseGeometry(n = nEmb, threshold = 0.9,
        recallTarget = 0.9)
      val bits = geom.bands * geom.bandBits
      val sig = e.select(col("vec_id").as("id"),
        Similarity.signSignature(col("embedding"), bits).as("sig"))
      val bandStructs = (0 until geom.bands).map { b =>
        struct(lit(b).as("band"),
          col("sig").substr(b * geom.bandBits + 1, geom.bandBits).as("key"))
      }
      val probes = sig.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val nEmbCand = probes.as("x").join(probes.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).distinct().count()
      // d_semantic's verify budget: sum |cell|*(|cell|-1)/2 over the
      // query's own k-means cells (nlist=16, iters=2)
      val cents = Similarity.trainCentroidsLiteral(e, 16, 2, "vec_id", "embedding")
      val cellPairs = Similarity.assignCells(e, cents, "vec_id", "embedding")
        .groupBy("cell").count()
        .agg(sum(col("count") * (col("count") - lit(1)) / lit(2)).cast("long"))
        .head().getLong(0)
      // The r20 FIXES' laws, measured beside the quadratics they
      // replace: the width-scaled geometry's candidates (constant
      // per-item budget → linear) and the √n-cell verify pairs (n^1.5).
      val wGeom = Similarity.chooseGeometryWide(nEmb, threshold = 0.9,
        recallTarget = 0.9)
      val wPlanes = Similarity.rademacherPlanes(
        wGeom.bands * wGeom.bandBits, 64, 42L)
      val wSig = e.select(col("vec_id").as("id"),
        graft.plans.FloatVecOps.rademacherSig(col("embedding"), wPlanes)
          .as("sig"))
      val wStructs = (0 until wGeom.bands).map { b =>
        struct(lit(b).as("band"),
          col("sig").substr(b * wGeom.bandBits + 1, wGeom.bandBits).as("key"))
      }
      val wProbes = wSig.select(col("id"), explode(array(wStructs: _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val nWideCand = wProbes.as("x").join(wProbes.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.id") < col("y.id"))
        .select(col("x.id"), col("y.id")).distinct().count()
      val autoNlist = Dedup.chooseNlist(nEmb)
      val autoCents = Similarity.trainCentroidsLiteral(
        e, autoNlist, 2, "vec_id", "embedding")
      val autoCellPairs = Similarity.assignCells(
          e, autoCents, "vec_id", "embedding")
        .groupBy("cell").count()
        .agg(sum(col("count") * (col("count") - lit(1)) / lit(2)).cast("long"))
        .head().getLong(0)
      println(s"""{"sf":"$sfDir","docs":$nDocs,"shingle_rows":$nShingle,""" +
        s""""minhash_candidates":$nCand,"minhash_pairs":$nPairs,""" +
        s""""embeddings":$nEmb,"geom":"${geom.bands}x${geom.bandBits}",""" +
        s""""embed_candidates":$nEmbCand,"semantic_cell_pairs":$cellPairs,""" +
        s""""wide_geom":"${wGeom.bands}x${wGeom.bandBits}",""" +
        s""""wide_candidates":$nWideCand,"auto_nlist":$autoNlist,""" +
        s""""auto_cell_pairs":$autoCellPairs}""")
    }
    if (what == "spanstages") {
      import org.apache.spark.sql.functions.{substring => ssub, _}
      val docs = Sources.table(spark, sfDir, "documents")
      val grams = docs.select(col("doc_id").as("id"),
          explode(when(length(col("text")) >= 30,
            sequence(lit(1), length(col("text")) - 29))
            .otherwise(array())).as("pos"), col("text"))
        .select(col("id"), col("pos"),
          col("text").substr(col("pos"), lit(30)).as("h"))
      timed("grams pass")(grams.select(max(length(col("h")))).count())
      timed("grams pass 2")(grams.select(max(length(col("h")))).count())
      val dup = grams.groupBy("h")
        .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
        .filter(col("lo") =!= col("hi")).select("h")
      timed("dup agg")(dup.count())
      val dp = grams.join(dup, "h").select("id", "pos")
      timed("join-back")(dp.count())
      timed("full operator")(
        Dedup.duplicatedSpans(docs, "doc_id", "text", 30, 2).count())
    }
    if (what == "minhashcmp") {
      val docs = Sources.table(spark, sfDir, "documents")
      val rel = Dedup.shingleRelation(docs, "doc_id", "text")
      timed("cand via relation bands")(
        Dedup.lshCandidates(Dedup.bandsFromRelation(rel, 6, 2)).count())
      timed("cand via map-only bands")(
        Dedup.lshCandidates(Dedup.mapOnlyBands(docs, "doc_id", "text")).count())
      timed("full d_minhash (relation)")(
        Dedup.minhashNearDups(docs, "doc_id", "text", 0.5).count())
      val candM = Dedup.lshCandidates(Dedup.mapOnlyBands(docs, "doc_id", "text"))
      timed("full d_minhash (map-only bands)")(
        Dedup.jaccardForCandidates(rel, candM, 0.5).count())
    }
    if (what == "rrfstages") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val e = Sources.table(spark, sfDir, "embeddings")
      val d = Sources.table(spark, sfDir, "documents")
      val qids = Seq(0L, 1L, 2L)
      val docs = d.join(e.select(col("vec_id")),
        d("doc_id") === col("vec_id"), "left_semi")
      val corpusE = e.join(d.select(col("doc_id")),
        e("vec_id") === col("doc_id"), "left_semi")
      timed("semi joins")(docs.count() + corpusE.count())
      val vec = Similarity.bruteForceTopK(
        corpusE, corpusE.filter(col("vec_id").isin(qids: _*)), k = 10)
      timed("vector top-10")(vec.count())
      val qtok = docs.filter(col("doc_id").isin(qids: _*))
        .select(col("doc_id").as("qid"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val dtok = docs.select(col("doc_id").as("id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val overlap = qtok.join(dtok, "tok").filter(col("id") =!= col("qid"))
        .groupBy("qid", "id").agg(count(lit(1)).as("ov"))
      val wl = Window.partitionBy(col("qid")).orderBy(col("ov").desc, col("id"))
      val lex = overlap.withColumn("rank", row_number().over(wl))
        .filter(col("rank") <= 10).select("qid", "id", "rank")
      timed("lexical top-10")(lex.count())
      timed("full query")(SparkEntry.queries("s_hybrid_rrf")(spark, sfDir).count())
    }
    if (what == "stages") {
      val docs = Sources.table(spark, sfDir, "documents")
      val rel = Dedup.shingleRelation(docs, "doc_id", "text")
      timed("rel scan")(rel.count())
      // Signature stage through the LIBRARY path (KM double hashing) so
      // the probe measures what d_minhash actually runs.
      val sigs = Dedup.bandsFromRelation(rel, 6, 2)
      timed("signatures+bands agg")(sigs.count())
      val bandsDf = Dedup.bandsFromRelation(rel, 6, 2)
      val cand = Dedup.lshCandidates(bandsDf)
      timed("candidates (sig + self-join + distinct)")(cand.count())
      val candP = cand.persist()
      candP.count()
      timed("verification given persisted candidates")(
        Dedup.jaccardForCandidates(rel, candP, 0.6).count())
      candP.unpersist()
      timed("full pipeline (no persist)")(
        Dedup.minhashNearDups(docs, "doc_id", "text", 0.6).count())
    }
    if (what == "r11adds") {
      // Factor-10 protocol for the round-11 additions (VERDICT r11 item
      // 5): print the scale-invariant COUNTS each design claim is made
      // of, then time the full query. Run at sf0.1 and at the ScaleData
      // 10× dir; the counts must track the data ratio (or stay constant
      // where the claim is output-boundedness).
      val docs = Sources.table(spark, sfDir, "documents")
      val li = Sources.table(spark, sfDir, "lineitem")
      // d_spans: gram rows are O(corpus chars) — the one exchange the
      // operator pays; duplicated positions and merged spans are
      // data-dependent but bounded by gram rows.
      println("spanGramRows=" + docs.select(
        sum(greatest(length(col("text")) - 29, lit(0)))).head().getLong(0))
      val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val grams = docs.select(col("doc_id").as("id"),
          explode(when(length(col("text")) >= 30,
            sequence(lit(1), length(col("text")) - 29))
            .otherwise(array())).as("pos"), col("text"))
        .select(col("id"), col("pos"),
          col("text").substr(col("pos"), lit(30)).as("h"))
      println("spanDupPositions=" + grams
        .withColumn("lo", min(col("id")).over(wH))
        .withColumn("hi", max(col("id")).over(wH))
        .filter(col("lo") =!= col("hi")).count())
      println("spanOutputRows=" + timed("full d_spans")(
        Dedup.duplicatedSpans(docs, "doc_id", "text", 30, 2).count()))
      // a_dq_report: input grows; output is fixed at |rules| — the
      // whole report is ONE pass of conditional aggregates.
      println("dqInputRows=" + li.count())
      println("dqOutputRows=" + timed("full a_dq_report")(
        SparkEntry.queries("a_dq_report")(spark, sfDir).count()))
      // s_hybrid_rrf: fusion meets only slim per-query top-k lists —
      // fused rows stay O(q·k) no matter the corpus size; the lexical
      // retriever's token join is the corpus-sized stage.
      println("rrfFusedRows=" + timed("full s_hybrid_rrf")(
        SparkEntry.queries("s_hybrid_rrf")(spark, sfDir).count()))
      // a_neg_sampling: map-only + two broadcasts, output rows == fact
      // rows. Time the LIBRARY operator (sort-free) and the query
      // wrapper (verify-edge sort) separately — the delta is the sort
      // a library caller no longer pays.
      val dim = Sources.table(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_type").as("neg_type"))
      println("negSampleRows=" + timed("library negativeSample (sort-free)")(
        graft.operators.Sampling.negativeSample(li, dim,
          Seq("l_orderkey", "l_linenumber"), "l_partkey", "p_partkey")
          .count()))
      timed("full a_neg_sampling (verify wrapper, sorted)")(
        SparkEntry.queries("a_neg_sampling")(spark, sfDir).count())
      // x_rs_quantiles (r12 addition): per-group sketch state is k
      // (hash,value) pairs regardless of input size.
      timed("full x_rs_quantiles")(
        SparkEntry.queries("x_rs_quantiles")(spark, sfDir).count())
    }
    if (what == "r12adds") {
      // Factor-10 protocol for the round-12 additions: d_semantic's
      // scale claim is that pairing is cluster-bounded (Σ|cell|²/2) and
      // nlist is the knob that keeps it near-linear; e_gapfill's spine
      // is domain-sized (|types|·|hours|, constant as the log grows);
      // t_bpe_pairs enumerates pairs over the DISTINCT vocab, not
      // corpus tokens.
      val docs = Sources.table(spark, sfDir, "documents")
      val emb = Sources.table(spark, sfDir, "embeddings")
      for (nlist <- Seq(16, 64)) {
        val cents = Similarity.trainCentroids(emb, nlist, 2)
        val assigned = Similarity.assignCells(emb, cents, "vec_id", "embedding")
        val pairs = assigned.groupBy("cell").count()
          .agg(sum((col("count") * (col("count") - lit(1)) / 2).cast("long")))
          .head().getLong(0)
        println(s"semPairBudget(nlist=$nlist)=$pairs")
      }
      timed("full d_semantic (nlist=16)")(
        SparkEntry.queries("d_semantic")(spark, sfDir).count())
      timed("d_semantic nlist=64")(
        Dedup.semanticDedup(emb, tau = 0.4, nlist = 64).count())
      println("gapfillSpineRows=" + timed("full e_gapfill")(
        SparkEntry.queries("e_gapfill")(spark, sfDir).count()))
      println("bpeVocabRows=" + docs
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2).distinct().count())
      timed("full t_bpe_pairs")(
        SparkEntry.queries("t_bpe_pairs")(spark, sfDir).count())
    }
    if (what == "r13adds") {
      // Factor-10 protocol for the round-12/13 additions the r12 run
      // didn't cover: q_recursive's frontier is bounded by orders rows
      // × depth cap; d_semantic_incremental's pair budget is
      // batch×corpus WITHIN shared cells (batch fixed at 100, so the
      // budget tracks the corpus); mm_video decodes Σ frames ∝ docs;
      // e_retention/e_rfm shuffle one slim row per (user, day) /
      // per user; the persisted IVFPQ search reads only probed-cell
      // code rows (the partition-pruned fraction of mm× the corpus).
      val docs = Sources.table(spark, sfDir, "documents")
      val emb = Sources.table(spark, sfDir, "embeddings")
      val ev = Sources.table(spark, sfDir, "events")

      println("recursiveChainRows=" + timed("full q_recursive")(
        SparkEntry.queries("q_recursive")(spark, sfDir).count()))

      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centvec"))
      val assigned = Similarity.assignCells(emb, cents, "vec_id", "embedding")
      val cut = emb.agg(max(col("vec_id"))).head().getLong(0) - 99L
      val perCell = assigned
        .groupBy("cell")
        .agg(sum(when(col("vid") >= cut, 1L).otherwise(0L)).as("nb"),
          sum(when(col("vid") < cut, 1L).otherwise(0L)).as("nc"))
      val semIncBudget = perCell
        .agg(sum(col("nb") * col("nc"))).head().getLong(0)
      println(s"semIncPairBudget=$semIncBudget")
      timed("full d_semantic_incremental")(
        SparkEntry.queries("d_semantic_incremental")(spark, sfDir).count())

      println("videoFramesDecoded=" + timed("full mm_video")(
        SparkEntry.queries("mm_video")(spark, sfDir)
          .agg(sum(col("n_frames"))).head().getLong(0)))

      println("retentionActiveRows=" + ev.select(col("user_id"),
        to_date(col("ts")).as("day")).distinct().count())
      println("retentionMatrixRows=" + timed("full e_retention_matrix")(
        SparkEntry.queries("e_retention_matrix")(spark, sfDir).count()))
      println("rfmUserRows=" + timed("full e_rfm")(
        SparkEntry.queries("e_rfm")(spark, sfDir).count()))

      // persisted IVFPQ: probed code rows vs total — the pruned read
      val cbooks = Similarity.pqSubvecs(
        emb.filter(col("vec_id") < 16), 8, 8, "vec_id", "embedding")
        .select(col("vec_id").cast("int").as("cid"), col("m"),
          col("sv").as("cv"))
      val codes = Similarity.pqEncode(emb, cbooks)
      val idx = java.nio.file.Files
        .createTempDirectory("ivfpq_probe").toString
      timed("writeIvfPqIndex")(Similarity.writeIvfPqIndex(codes, cbooks, idx))
      println("ivfpqTotalCodeRows=" + spark.read.parquet(
        graft.sources.EpochDir.live(spark, s"$idx/codes")).count())
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      // probed fraction: parse the cell INSET the executed plan pruned
      // to, then count the code rows inside those cell directories
      // (one Dataset: the timed count also finalizes the AQE plan)
      val searched = Similarity.adcIvfTopKIndexed(spark, idx, queries, k = 5)
      timed("adcIvfTopKIndexed")(searched.count())
      val planStr = searched.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(planStr).map(_.group(1)).getOrElse("")
      val insetCells = "\\d+".r.findAllIn(
        pf.replaceAll("cell#\\d+", "cell")).map(_.toInt).toSeq.distinct
      println(s"ivfpqProbedCells=${insetCells.size}")
      println("ivfpqProbedCodeRows=" + spark.read.parquet(
        graft.sources.EpochDir.live(spark, s"$idx/codes"))
        .filter(col("cell").isin(insetCells: _*)).count())

      // The r13 additions' own measures: MRL stage-1 pairs are q·(n−1)
      // (the brute baseline — by design; stage 2 is candidate-bounded
      // at q·50 regardless of n); mm_neardup's hash pass is corpus-
      // sized while pairing is slice-bounded; the Q13/Q15/Q22 shapes
      // aggregate a 10× fact against constant dims.
      println("mrlStage1Pairs=" + (3L * (emb.count() - 1)))
      timed("full s_mrl_rerank")(
        SparkEntry.queries("s_mrl_rerank")(spark, sfDir).count())
      println("neardupHashRows=" + docs.count())
      println("neardupPairs=" + timed("full mm_neardup")(
        SparkEntry.queries("mm_neardup")(spark, sfDir).count()))
      println("q13CustomerRows=" +
        Sources.table(spark, sfDir, "customer").count())
      println("q13OutputRows=" + timed("full q13_order_distribution")(
        SparkEntry.queries("q13_order_distribution")(spark, sfDir).count()))
      println("q15SupplierGroups=" + timed("full q15_top_supplier")(
        SparkEntry.queries("q15_top_supplier")(spark, sfDir).count()))
      println("q22OutputRows=" + timed("full q22_sales_opportunity")(
        SparkEntry.queries("q22_sales_opportunity")(spark, sfDir).count()))
    }
    if (what == "r14adds") {
      val emb = Sources.table(spark, sfDir, "embeddings")
      val docsT = Sources.table(spark, sfDir, "documents")

      // s_mrl_ivf: the standing prefix-16 IVF index and its pruned
      // stage-1 read. Evidence of scale shape: probed cell rows track
      // ~nProbe/nlist of the corpus; stage 2 stays candidate-bounded
      // at q·50 whatever n is.
      def prefix(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), slice(col("embedding"), 1, 16)
          .as("embedding"))
      val mrlIdx = java.nio.file.Files
        .createTempDirectory("mrlivf_probe").toString
      timed("writeIvfIndex(prefix16)")(
        Similarity.writeIvfIndex(prefix(emb), mrlIdx, nlist = 16))
      println("mrlCellRowsTotal=" +
        spark.read.parquet(
          graft.sources.EpochDir.live(spark, s"$mrlIdx/cells")).count())
      val mrlQ = prefix(emb.filter(col("vec_id").isin(0L, 1L, 2L)))
      val s1 = Similarity.ivfTopKIndexed(spark, mrlIdx, mrlQ,
        k = 50, nProbe = 8)
      timed("mrlStage1Indexed")(s1.count())
      val s1pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(s1.queryExecution.executedPlan.toString)
        .map(_.group(1)).getOrElse("")
      val s1cells = "\\d+".r.findAllIn(
        s1pf.replaceAll("cell#\\d+", "cell")).map(_.toInt).toSeq.distinct
      println(s"mrlProbedCells=${s1cells.size}")
      println("mrlProbedCellRows=" + spark.read.parquet(
        graft.sources.EpochDir.live(spark, s"$mrlIdx/cells"))
        .filter(col("cell").isin(s1cells: _*)).count())
      println("mrlFunnelRows=" + timed("full s_mrl_ivf")(
        SparkEntry.queries("s_mrl_ivf")(spark, sfDir).count()))

      // size-bounded compaction over the same cells dir: accrete a
      // second wave of files, compact with a row cap, report file
      // count and the largest file — the cap must hold at every SF.
      Similarity.appendToIvfIndex(
        emb.filter(col("vec_id") >= 16).limit(1000)
          .select(col("vec_id"), slice(col("embedding"), 1, 16)
            .as("embedding")), mrlIdx)
      timed("compactCellIndex(cap=2048)")(
        Similarity.compactCellIndex(spark, s"$mrlIdx/cells",
          maxRecordsPerFile = 2048L))
      val perFile = spark.read.parquet(
        graft.sources.EpochDir.live(spark, s"$mrlIdx/cells"))
        .groupBy(input_file_name().as("f")).count()
        .agg(count(lit(1)).as("files"), max(col("count")).as("maxRows"))
        .head()
      println(s"compactFiles=${perFile.getLong(0)} " +
        s"compactMaxRowsPerFile=${perFile.getLong(1)}")

      // t_mixture_apply: the only corpus-sized work is the token-count
      // shuffle; output is |langs|-sized at every SF.
      println("mixtureApplyRows=" + timed("full t_mixture_apply")(
        SparkEntry.queries("t_mixture_apply")(spark, sfDir).count()))
      println("mixtureKeptDocs=" + graft.operators.Curation.applyMixture(
        docsT, Seq(("en", 0.4), ("de", 0.15), ("es", 0.15),
          ("fr", 0.15), ("zh", 0.15))).count())

      // standing decontamination index: the train side is paid once
      // (index build, logged separately); each arriving release pays
      // its own shingles + an exchange-free probe of the bucketed
      // index. Counts: index size vs batch size are the evidence.
      import graft.operators.TextAnalysis
      val sp = docsT.select(col("doc_id").as("id"),
        TextAnalysis.hashSplit(col("doc_id")).as("sp"))
      val shRel = Dedup.shingleRelation(docsT, "doc_id", "text")
        .join(sp, "id")
      println("trainDistinctShingles=" + shRel.filter(col("sp") === "train")
        .select("shingle").distinct().count())
      println("testShingleRows=" + shRel.filter(col("sp") === "test").count())
      println("contamIncRows=" + timed("full t_contamination_incremental")(
        SparkEntry.queries("t_contamination_incremental")(spark, sfDir)
          .count()))

      // epoch ordering: output is shards×epochs×5 at every SF; the
      // corpus-side work is the 2n hash rows + the sharded rank.
      println("epochOrderRows=" + timed("full t_epoch_order")(
        SparkEntry.queries("t_epoch_order")(spark, sfDir).count()))

      // quality-bucket sampling: map-only (score → fixed-threshold
      // bucket → band keep) — kept rows track the corpus linearly.
      println("qualitySampleKept=" + timed("full t_quality_sample")(
        SparkEntry.queries("t_quality_sample")(spark, sfDir).count()))

      // BPE: training touches the corpus once (the vocab count); the
      // 8-merge loop is vocab-sized and its model is 8 rows at every
      // SF. Encoding rides the distinct vocab too — corpus cost is the
      // one explode+join pass (n_tokens tracks the corpus linearly).
      println("bpeVocabWords=" + graft.operators.Bpe
        .vocab(docsT, "text").count())
      println("bpeTrainRows=" + timed("full t_bpe_train")(
        SparkEntry.queries("t_bpe_train")(spark, sfDir).count()))
      val bpeEnc = SparkEntry.queries("t_bpe_encode")(spark, sfDir)
        .agg(count(lit(1)).as("docs"), sum("n_tokens").as("toks")).head()
      println(s"bpeEncodeDocs=${bpeEnc.getLong(0)} " +
        s"bpeTotalTokens=${bpeEnc.getLong(1)}")

      // context-window chunking: map-only explode — chunk count tracks
      // corpus tokens; no shuffle before the presentation sort.
      println("chunkRows=" + timed("full t_chunk")(
        SparkEntry.queries("t_chunk")(spark, sfDir).count()))

      // LM familiarity scoring: model = one map-combined count shuffle
      // over train bigrams; scoring = key-partitioned left join —
      // both sides linear in the corpus, no broadcast assumption.
      println("lmModelBigrams=" + docsT
        .filter(TextAnalysis.hashSplit(col("doc_id")) === "train")
        .select(explode(TextAnalysis.wordBigrams(col("text"))).as("bg"))
        .distinct().count())
      println("lmScoreRows=" + timed("full t_lm_score")(
        SparkEntry.queries("t_lm_score")(spark, sfDir).count()))

      // q_recursive isolated recheck (BASELINE.md protocol for the r13
      // perf-weak flag): scratch-parquet edges instead of
      // localCheckpoint.
      println("qRecursiveRows=" + timed("full q_recursive")(
        SparkEntry.queries("q_recursive")(spark, sfDir).count()))

      // TPC-H suite completions: each aggregates a 10× fact against
      // constant dims; output is top-k-bounded (q10), threshold-bounded
      // (q11: the 0.001 fraction keeps the kept-part count roughly
      // stable as the total grows with the data), attribute-domain-
      // bounded (q16), or supplier-domain-bounded (q20).
      println("q10OutputRows=" + timed("full q10_returned_items")(
        SparkEntry.queries("q10_returned_items")(spark, sfDir).count()))
      println("q11KeptParts=" + timed("full q11_important_parts")(
        SparkEntry.queries("q11_important_parts")(spark, sfDir).count()))
      println("q16AttrBuckets=" + timed("full q16_supplier_counts")(
        SparkEntry.queries("q16_supplier_counts")(spark, sfDir).count()))
      println("q20Suppliers=" + timed("full q20_promotable_suppliers")(
        SparkEntry.queries("q20_promotable_suppliers")(spark, sfDir).count()))

      // winnowing: selected fingerprints track corpus grams at ~2/(w+1)
      // density; the MOSS pairing is bounded by Σ df² over RARE keys
      // (df-capped), never corpus². TF-IDF: tf/df aggs and the term join
      // are corpus-term-sized; output is 3 rows per doc.
      println("winnowFps=" + timed("full t_winnow")(
        SparkEntry.queries("t_winnow")(spark, sfDir).count()))
      println("winnowPairs=" + timed("full d_winnow_pairs")(
        SparkEntry.queries("d_winnow_pairs")(spark, sfDir).count()))
      println("tfidfRows=" + timed("full t_tfidf")(
        SparkEntry.queries("t_tfidf")(spark, sfDir).count()))

      // MMR: candidate generation is the brute scan (q·n pairs); the
      // greedy itself is candidate-bounded (n + n² rows per query,
      // n fixed) — output is q·k at every SF.
      println("mmrRows=" + timed("full s_mmr")(
        SparkEntry.queries("s_mmr")(spark, sfDir).count()))

      // collocations: token explode + two hash aggs + a vocab join —
      // output is top-20 at every SF.
      println("collocRows=" + timed("full t_collocations")(
        SparkEntry.queries("t_collocations")(spark, sfDir).count()))
    }
    if (what == "r14b") {
      // g_pagerank: the corpus-sized work is ONE distinct over
      // lineitem (part, supplier) pairs; edges then saturate toward
      // the |parts|·|suppliers| domain, and each of the 5 iterations
      // shuffles |E| — evidence is the edge count vs lineitem rows.
      val li = Sources.table(spark, sfDir, "lineitem")
      println("prLineitem=" + li.count())
      val e0 = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      println("prEdges=" + timed("pr distinct pairs")(e0.count()))
      println("prRows=" + timed("g_pagerank cold (incl. edge build)")(
        SparkEntry.queries("g_pagerank")(spark, sfDir).count()))
      timed("g_pagerank warm (5 rank rounds over the standing index)")(
        SparkEntry.queries("g_pagerank")(spark, sfDir).count())
      println("bfsRows=" + timed("g_bfs (4 frontier rounds, same index)")(
        SparkEntry.queries("g_bfs")(spark, sfDir).count()))
      println("trustRows=" + timed("g_trustrank (5 rounds, same index)")(
        SparkEntry.queries("g_trustrank")(spark, sfDir).count()))
      println("docRankRows=" + timed("g_doc_rank (minhash pairs + 3 rounds)")(
        SparkEntry.queries("g_doc_rank")(spark, sfDir).count()))
      println("wRankRows=" + timed("g_rank_weighted (same pairs, weighted)")(
        SparkEntry.queries("g_rank_weighted")(spark, sfDir).count()))

      // e_cusum / e_autocorr: the only corpus-sized work is the
      // hourly count shuffle; the windows run over the |types|·|hours|
      // series, which the 10× generator leaves UNCHANGED (it grows
      // users, not time span) — rows flat, wall flat is the claim.
      println("cusumRows=" + timed("full e_cusum")(
        SparkEntry.queries("e_cusum")(spark, sfDir).count()))
      println("acfRows=" + timed("full e_autocorr")(
        SparkEntry.queries("e_autocorr")(spark, sfDir).count()))

      // d_fuzzy_match: pair work is |distinct-name domain|², blocked —
      // corpus growth only adds rows to the one distinct shuffle.
      val p = Sources.table(spark, sfDir, "part")
      println("fuzzyParts=" + p.count())
      println("fuzzyDomain=" + p.select("p_name").distinct().count())
      println("fuzzyRows=" + timed("full d_fuzzy_match")(
        SparkEntry.queries("d_fuzzy_match")(spark, sfDir).count()))

      // t_dsir: one feature explode (corpus bigrams), two map-combined
      // counts, a 64-row broadcast weight join, one per-doc agg.
      println("dsirRows=" + timed("full t_dsir")(
        SparkEntry.queries("t_dsir")(spark, sfDir).count()))

      // j_range_binned: |L| + 2|R| shuffled rows on the bin key —
      // pair count is the selectivity evidence.
      println("rangePairs=" + timed("binned range join pairs")(
        {
          val o = Sources.table(spark, sfDir, "orders")
          val pts = o.select(col("o_orderkey"), col("o_totalprice").as("p"))
          val iv = o.groupBy("o_custkey")
            .agg(min(col("o_totalprice")).as("lo"))
            .select(col("o_custkey").as("c"), col("lo"),
              (col("lo") + 1000.0).as("hi"))
          graft.operators.Joins.binnedRangeJoin(pts, "p", iv, "lo", "hi",
            1000.0).count()
        }))
      println("forecastRows=" + timed("full e_forecast")(
        SparkEntry.queries("e_forecast")(spark, sfDir).count()))
      println("giniRows=" + timed("full a_gini")(
        SparkEntry.queries("a_gini")(spark, sfDir).count()))
      println("topicsRows=" + timed("s_cluster_topics cold (incl. training)")(
        SparkEntry.queries("s_cluster_topics")(spark, sfDir).count()))
      timed("s_cluster_topics warm (assignment + labeling)")(
        SparkEntry.queries("s_cluster_topics")(spark, sfDir).count())
    }
    if (what == "r15adds") {
      // r15's weighted-rank rework: g_rank_weighted now rides a per-JVM
      // standing BUCKETED doc-edge index like g_doc_rank (the r14
      // perf-weak flag). Cold = minhash pipeline + index build + 3
      // rounds; warm = the 3 rank rounds alone — the done-criterion is
      // warm ≈ in-bench and 10× wall within ~1.2× of g_doc_rank's.
      println("docRankCold=" + timed("g_doc_rank cold (minhash+build+3 rounds)")(
        SparkEntry.queries("g_doc_rank")(spark, sfDir).count()))
      timed("g_doc_rank warm (3 rounds over standing index)")(
        SparkEntry.queries("g_doc_rank")(spark, sfDir).count())
      println("wRankCold=" + timed("g_rank_weighted cold (minhash+build+3 rounds)")(
        SparkEntry.queries("g_rank_weighted")(spark, sfDir).count()))
      timed("g_rank_weighted warm (3 weighted rounds, standing index)")(
        SparkEntry.queries("g_rank_weighted")(spark, sfDir).count())

      // t_dsir: the corpus-sized bigram explode now runs ONCE into the
      // staged (doc, lang, bucket, c) relation (≤64 rows per doc);
      // weights and scoring both read the file — was 2 explodes.
      println("dsirRows=" + timed("full t_dsir (one corpus explode)")(
        SparkEntry.queries("t_dsir")(spark, sfDir).count()))

      // e_cusum with the floor-div target (same exchange count)
      println("cusumRows=" + timed("full e_cusum")(
        SparkEntry.queries("e_cusum")(spark, sfDir).count()))

      // g_hits: the materialized + broadcast-scored loop (construction
      // is eager — time the whole call, not just the final count)
      println("hitsRows=" + timed("g_hits cold (edge build + 3 rounds)")(
        SparkEntry.queries("g_hits")(spark, sfDir).count()))
      timed("g_hits warm (3 rounds over standing index)")(
        SparkEntry.queries("g_hits")(spark, sfDir).count())
      println("triRows=" + timed("full g_triangles (warm index)")(
        SparkEntry.queries("g_triangles")(spark, sfDir).count()))
      println("predictRows=" + timed("full g_predict (warm index)")(
        SparkEntry.queries("g_predict")(spark, sfDir).count()))

      // the remaining round-15 additions: cluster-balanced resampling
      // (one corpus pass + model-state counts), bounded-state few-shot
      // sampling (no stratum sort), two-sided binned interval overlap
      // (one equi shuffle), staged-bigram novelty curve
      println("cbRows=" + timed("full s_cluster_balance")(
        SparkEntry.queries("s_cluster_balance")(spark, sfDir).count()))
      println("evalRows=" + timed("full t_eval_sample")(
        SparkEntry.queries("t_eval_sample")(spark, sfDir).count()))
      println("ivRows=" + timed("full j_interval_overlap")(
        SparkEntry.queries("j_interval_overlap")(spark, sfDir).count()))
      println("nvRows=" + timed("full t_ngram_novelty")(
        SparkEntry.queries("t_ngram_novelty")(spark, sfDir).count()))
    }

    if (what == "r16adds") {
      // Round-16 additions + the 100× probe set (VERDICT r15 items 5,
      // 7, 8). Run at sf0.1 AND at the factor-10 ScaleData blow-up of
      // sf0.1 (~sf1, i.e. 100× the sf0.01 verify scale): counts must
      // track the data ratio; walls must stay near-linear.
      val docsT = Sources.table(spark, sfDir, "documents")
      val emb = Sources.table(spark, sfDir, "embeddings")

      // unigram tokenizer: the corpus pays ONE distinct-word scan for
      // training (EM rounds ride |vocab|) and one explode+join encode.
      println("unigramVocabWords=" + graft.operators.Bpe
        .vocab(docsT, "text").count())
      println("unigramTrainRows=" + timed("t_unigram_train cold (3-round EM)")(
        SparkEntry.queries("t_unigram_train")(spark, sfDir).count()))
      timed("t_unigram_train warm (cached model)")(
        SparkEntry.queries("t_unigram_train")(spark, sfDir).count())
      val uniEnc = SparkEntry.queries("t_unigram_encode")(spark, sfDir)
        .agg(count(lit(1)).as("docs"), sum("n_tokens").as("toks")).head()
      println(s"unigramEncodeDocs=${uniEnc.getLong(0)} " +
        s"unigramTotalTokens=${uniEnc.getLong(1)}")

      // IVFPQ standing index: build once; a probed search reads only
      // the probed cells' code rows (partition-pruned epoch scan).
      import graft.sources.EpochDir
      val cbooks = Similarity.pqSubvecs(
        emb.filter(col("vec_id") < 16), 8, 8, "vec_id", "embedding")
        .select(col("vec_id").cast("int").as("cid"), col("m"),
          col("sv").as("cv"))
      val idx = java.nio.file.Files
        .createTempDirectory("ivfpq_r16").toString
      timed("writeIvfPqIndex")(Similarity.writeIvfPqIndex(
        Similarity.pqEncode(emb, cbooks), cbooks, idx))
      println("ivfpqTotalCodeRows=" + spark.read.parquet(
        EpochDir.live(spark, s"$idx/codes")).count())
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      val searched = Similarity.adcIvfTopKIndexed(spark, idx, queries, k = 5)
      timed("adcIvfTopKIndexed cold")(searched.count())
      timed("adcIvfTopKIndexed warm")(
        Similarity.adcIvfTopKIndexed(spark, idx, queries, k = 5).count())
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(searched.queryExecution.executedPlan.toString)
        .map(_.group(1)).getOrElse("")
      val insetCells = "\\d+".r.findAllIn(
        pf.replaceAll("cell#\\d+", "cell")).map(_.toInt).toSeq.distinct
      println(s"ivfpqProbedCells=${insetCells.size}")
      println("ivfpqProbedCodeRows=" + spark.read.parquet(
        EpochDir.live(spark, s"$idx/codes"))
        .filter(col("cell").isin(insetCells: _*)).count())

      // stream-stream join state plateau (RocksDB): events replayed as
      // 24 time-ordered micro-batches; state must plateau at the
      // watermark window while ingested rows grow with the SF.
      val ev = Sources.table(spark, sfDir, "events")
      val prof = graft.streaming.EventStreams.withRocksDbStateStore(spark) {
        graft.streaming.EventStreams.stateSizeProfile(spark, ev, 24,
          java.nio.file.Files.createTempDirectory("state_prof").toString,
          st => graft.streaming.EventStreams.clickPurchaseJoin(st))
      }
      val dataBatches = prof.filter(_._1 > 0)
      println(s"ssJoinIngestedRows=${dataBatches.map(_._1).sum} " +
        s"ssJoinStateMax=${dataBatches.map(_._2).max} " +
        s"ssJoinStateLast=${dataBatches.last._2}")
    }
    if (what == "planscan") {
      // Static sweep: render every query's pre-execution physical plan
      // and flag scale-killer shapes (Expand from multi-distinct,
      // CartesianProduct). Plan-only EXCEPT first-touch staging:
      // constructing the dedup-family queries runs
      // DedupQueries.stagedMinhashPairs' one-time staging write on a
      // cold scratch dir (real Spark jobs), so the seconds-long claim
      // holds only once that cache is warm. Expand is LEGITIMATE under
      // rollup/cube/grouping-sets; those hits are listed for
      // eyeballing, not failed.
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        try {
          val p = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.sparkPlan.toString
          val flags = Seq(
            if (p.contains("Expand")) Some("Expand") else None,
            if (p.contains("CartesianProduct")) Some("Cartesian") else None
          ).flatten
          if (flags.nonEmpty) println(s"planscan $name: ${flags.mkString(",")}")
        } catch { case e: Exception =>
          println(s"planscan $name: ERROR ${e.toString.take(120)}")
        }
      }
      println("planscan done")
    }
    if (what == "lsncheck") {
      // sanity check of the shuffle-records listener against a job
      // with a KNOWN exchange row count (1M rows into a 97-key agg:
      // partial-agg shuffle writes ≤ tasks·97 records, ≥ 97)
      val recs = new java.util.concurrent.atomic.AtomicLong
      val lsn = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            recs.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(lsn)
      spark.range(1000000).selectExpr("id % 97 AS k", "id")
        .groupBy("k").agg(sum("id")).count()
      Thread.sleep(3000)
      spark.sparkContext.removeSparkListener(lsn)
      println(s"lsnRecords=${recs.get()}")
    }
    if (what == "r17graph") {
      // Factor-10 protocol for the GRAPH family (VERDICT r16 #6): the
      // fixed-point loops had only 10× evidence. Build the standing
      // part–supplier edge index with the bucketed layout FORCED
      // (bucketIfOver = 0 — the 100 TB layout, which the data-driven
      // cap would bypass at probe |V|), then run 3 rank rounds under a
      // shuffle-records listener: the law is that each round exchanges
      // only |V|-bounded rank/agg rows — the |E| edge table is never
      // re-shuffled after its one build write — so total shuffled
      // records across the loop must stay well under iters·|E|.
      import graft.operators.Graph
      val li = Sources.table(spark, sfDir, "lineitem")
      val pairs = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val idx = timed("edge index build (bucketed, symmetrized)")(
        Graph.materializeEdges(pairs, s"r17graph:$sfDir",
          validateDangling = false, symmetrize = true, bucketIfOver = 0L))
      val nV = idx.nodes(spark).count()
      val nE = idx.edges(spark).count()
      println(s"grNodes=$nV grEdges=$nE")
      val recs = new java.util.concurrent.atomic.AtomicLong
      val lsn = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            recs.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(lsn)
      val iters = 3
      // FULL materialization (toRdd.count, the Bench protocol): a bare
      // count() lets Catalyst eliminate the per-round left-join+agg
      // chain entirely (row count = |nodes| is statically derivable),
      // so the loop never executes — measured 2 shuffle records and
      // 0.58 s before this fix caught it.
      println("grRankRows=" + timed(s"$iters rank rounds (standing index)")(
        Graph.pageRankIndexed(spark, idx, iters = iters)
          .queryExecution.toRdd.count()))
      Thread.sleep(3000) // listener bus drains async
      spark.sparkContext.removeSparkListener(lsn)
      val shuffled = recs.get()
      println(f"grShuffledRecords=$shuffled%d " +
        f"perRoundPerV=${shuffled.toDouble / (iters * nV)}%.2f " +
        f"vsItersE=${shuffled.toDouble / (iters.toDouble * nE)}%.3f")
      require(shuffled < iters.toLong * nE,
        s"rank loop re-exchanged the edge table: $shuffled records >= " +
          s"${iters} * |E| (${iters.toLong * nE})")

      // The part–supplier graph's |V|/|E| SATURATE under the scale
      // generator (dimension keys stay put by design — SCALING.md's
      // broadcast-ability axiom), so the axis where the GRAPH itself
      // grows 10× is the document near-dup graph: doc ids shift per
      // copy and each copy contributes its own isomorphic pair set.
      // Same law, growing |V|: rank rounds exchange |V|-bounded rows.
      val docPairs = spark.read
        .parquet(graft.queries.DedupQueries.stagedMinhashPairs(spark, sfDir))
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val dIdx = timed("doc edge index build (bucketed, symmetrized)")(
        Graph.materializeEdges(docPairs, s"r17graphdoc:$sfDir",
          validateDangling = false, symmetrize = true, bucketIfOver = 0L))
      val dV = dIdx.nodes(spark).count()
      val dE = dIdx.edges(spark).count()
      println(s"docNodes=$dV docEdges=$dE")
      val dRecs = new java.util.concurrent.atomic.AtomicLong
      val dLsn = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            dRecs.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(dLsn)
      println("docRankRows=" + timed(s"$iters doc rank rounds (standing index)")(
        Graph.pageRankIndexed(spark, dIdx, iters = iters,
          allNodesReceive = true).queryExecution.toRdd.count()))
      Thread.sleep(3000)
      spark.sparkContext.removeSparkListener(dLsn)
      println(f"docShuffledRecords=${dRecs.get()}%d " +
        f"docPerRoundPerV=${dRecs.get().toDouble / (iters * dV)}%.2f")

      // the rest of the fixed-point family, full query walls
      println("hitsRows=" + timed("full g_hits (3 mutual rounds)")(
        SparkEntry.queries("g_hits")(spark, sfDir).count()))
      println("trustRows=" + timed("full g_trustrank (5 rounds)")(
        SparkEntry.queries("g_trustrank")(spark, sfDir).count()))
      println("componentsRows=" + timed("full d_components (iterated min)")(
        SparkEntry.queries("d_components")(spark, sfDir).count()))
    }
    if (what == "r18spill") {
      // Spill/memory evidence for the board's two biggest shuffles
      // (VERDICT r17 #8): d_spans' gram-key sort and d_minhash's pair
      // verify, run at the given corpus (pass the 10× dir) under a
      // task-metrics listener recording shuffle SPILL (memory + disk)
      // and task failures. The 100 TB claim this answers: the
      // sort-based plans DEGRADE GRACEFULLY when a partition outgrows
      // execution memory — they spill and finish with zero failed
      // tasks — rather than OOM. Full-materialization protocol
      // (toRdd.count), same as the bench.
      val mem = new java.util.concurrent.atomic.AtomicLong
      val disk = new java.util.concurrent.atomic.AtomicLong
      val peak = new java.util.concurrent.atomic.AtomicLong
      val failed = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val lsn = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (!e.reason.isInstanceOf[org.apache.spark.Success.type])
            failed.incrementAndGet()
          if (e.taskMetrics != null) {
            mem.addAndGet(e.taskMetrics.memoryBytesSpilled)
            disk.addAndGet(e.taskMetrics.diskBytesSpilled)
            peak.updateAndGet(p => math.max(p,
              e.taskMetrics.peakExecutionMemory))
          }
        }
      }
      Seq("d_spans", "d_minhash").foreach { name =>
        mem.set(0); disk.set(0); failed.set(0); tasks.set(0); peak.set(0)
        spark.sparkContext.addSparkListener(lsn)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(3000) // listener bus drains async
        spark.sparkContext.removeSparkListener(lsn)
        println(f"spill $name: wall=$wall%.2f s tasks=${tasks.get()}%d " +
          f"failed=${failed.get()}%d memSpill=${mem.get()}%d " +
          f"diskSpill=${disk.get()}%d peakTaskMem=${peak.get()}%d")
      }
    }
    if (what == "curate") {
      // Factor-10 protocol for the curation pipeline: stage counts are
      // the evidence (each stage reuses a measured primitive — gopher
      // map-only, fingerprint window, minhash band join, components).
      // The gate runs LANGUAGE-AWARE (gopherPassLang) with the scale
      // generator's language family registered: each 10× copy is a
      // Caesar rotation of the base corpus (ScaleData), i.e. a distinct
      // synthetic language whose function words are the rotated English
      // stopwords. Registering all 26 rotations keeps the probe
      // generator-agnostic; with the r12 English-only gate every copy
      // beyond rot0 was dropped at stage 1 and the downstream dedup
      // stages never saw 10× data (the r12 SCALING.md caveat — now
      // closed, the composed probe is load-bearing end to end).
      val alphabet = ('a' to 'z').mkString
      val rotRegistry: Map[String, Seq[String]] = (0 until 26).map { i =>
        val p = alphabet.drop(i) + alphabet.take(i)
        f"rot$i%02d" -> graft.operators.TextAnalysis.Stopwords
          .map(_.map(c => p(c - 'a')))
      }.toMap
      val docs = Sources.table(spark, sfDir, "documents")
      val out = java.nio.file.Files
        .createTempDirectory("curate_probe").toString
      val t0 = System.nanoTime()
      val rep = graft.operators.Curation.curate(docs, out, jaccard = 0.5,
        stopwords = rotRegistry)
      println(f"curateWall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(s"curateInput=${rep.input} afterQuality=${rep.afterQuality} " +
        s"afterExact=${rep.afterExactDedup} afterNearDup=${rep.afterNearDup} " +
        s"bySplit=${rep.bySplit.toSeq.sorted.mkString(",")}")
      // canonical=rank: same pipeline with the centrality keep-choice —
      // the pair relation stages once and feeds components + rank, so
      // the delta over min-id is one extra rank loop, never a second
      // minhash pipeline (scalar stage counts must be identical).
      val outR = java.nio.file.Files
        .createTempDirectory("curate_probe_rank").toString
      val t1 = System.nanoTime()
      val repR = graft.operators.Curation.curate(docs, outR, jaccard = 0.5,
        stopwords = rotRegistry, canonical = "rank")
      println(f"curateRankWall=${(System.nanoTime() - t1) / 1e9}%.2f s")
      require(repR.input == rep.input &&
        repR.afterQuality == rep.afterQuality &&
        repR.afterExactDedup == rep.afterExactDedup &&
        repR.afterNearDup == rep.afterNearDup,
        "canonical choice must not change scalar audit counts")
      println(s"curateRankCountsMatch=true")
    }
    if (what == "all" || what == "minhash") {
      val docs = Sources.table(spark, sfDir, "documents")
      val rel = Dedup.shingleRelation(docs, "doc_id", "text")
      println("relRows=" + timed("rel count")(rel.count()))
      val bandsDf = Dedup.bandsFromRelation(rel, 6, 2)
      val cand = Dedup.lshCandidates(bandsDf)
      println("minhashCandidates=" + timed("cand count")(cand.count()))
      timed("full d_minhash")(
        Dedup.minhashNearDups(docs, "doc_id", "text", 0.6).count())
    }
    if (what == "all" || what == "ivf") {
      // Measured-ratio protocol for the IVF pipeline: the scale claim is
      // that rerank work is the PROBED fraction of the corpus
      // (~ q · nProbe/nlist · n rows — linear in n at fixed geometry),
      // not the whole corpus. Reproduces ivfSearch's assignment with the
      // library's own pieces and counts the rerank input.
      import graft.plans.FloatVecOps.{floatDot, floatNorm2}
      val emb = Sources.table(spark, sfDir, "embeddings")
      val n = emb.count()
      println(s"ivfCorpusRows=$n")
      val nlist = 16
      val nProbe = 4
      val cents = emb.filter(col("vec_id") < nlist)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centvec"))
      val centsN = cents.select(col("cid"), col("centvec"),
        sqrt(floatNorm2(col("centvec"))).as("cnrm"))
      val assigned = emb
        .select(col("vec_id").as("vid"), col("embedding").as("cvec"),
          sqrt(floatNorm2(col("embedding"))).as("vnrm"))
        .join(broadcast(centsN))
        .select(col("vid"), col("cid"),
          round(floatDot(col("cvec"), col("centvec")) /
            (col("vnrm") * col("cnrm")), 6).as("acos"))
        .groupBy("vid")
        .agg(max_by(col("cid"), struct(col("acos"), -col("cid"))).as("cell"))
      val cellSizes = timed("assignment")(
        assigned.groupBy("cell").count().collect())
      println(s"ivfOccupiedCells=${cellSizes.length} " +
        s"maxCell=${cellSizes.map(_.getLong(1)).max} " +
        s"meanCell=${cellSizes.map(_.getLong(1)).sum / cellSizes.length}")
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      val qprobes = queries
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          sqrt(floatNorm2(col("embedding"))).as("qnrm"))
        .join(broadcast(centsN))
        .select(col("qid"), col("cid"),
          round(floatDot(col("qvec"), col("centvec")) /
            (col("qnrm") * col("cnrm")), 6).as("acos"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("acos").desc, col("cid"))))
        .filter(col("rn") <= nProbe)
        .select(col("qid"), col("cid").as("cell"))
      println("ivfRerankCandidates=" + timed("probe-join count")(
        assigned.join(broadcast(qprobes), Seq("cell"))
          .filter(col("qid") =!= col("vid")).count()))
      timed("full s_ann_ivf")(
        Similarity.ivfTopK(emb, queries, k = 5).count())
      timed("full s_ann_ivf_trained")(
        Similarity.ivfTopKTrained(emb, queries, k = 5).count())
    }
    if (what == "all" || what == "contamination") {
      // Measured-ratio protocol for the cross-corpus overlap join: the
      // scale claim is that the inverted-index join meets rows only on
      // SHARED shingle keys (output ~ sum of per-shingle test×train
      // multiplicities), never on test×train document pairs.
      import graft.operators.TextAnalysis
      val d = Sources.table(spark, sfDir, "documents")
      val splits = d.select(col("doc_id").as("id"),
        TextAnalysis.hashSplit(col("doc_id")).as("split"))
      val rel = Dedup.shingleRelation(d, "doc_id", "text").join(splits, "id")
      val test = rel.filter(col("split") === "test")
      val testRows = timed("test shingle rows")(test.count())
      val trainShingles = rel.filter(col("split") === "train")
        .select("shingle").distinct()
      val trainRows = timed("distinct train shingles")(trainShingles.count())
      val joined = timed("inverted-index join rows")(
        test.join(trainShingles, "shingle").count())
      println(s"contamTestShingleRows=$testRows " +
        s"contamTrainDistinctShingles=$trainRows contamJoinRows=$joined")
      timed("full t_contamination")(
        SparkEntry.queries("t_contamination")(spark, sfDir).count())
    }
    if (what == "all" || what == "embed") {
      val emb = Sources.table(spark, sfDir, "embeddings")
      for ((bands, bits) <- Seq((16, 4), (8, 8))) {
        val base = emb.select(col("vec_id").as("id"),
          Similarity.signSignature(col("embedding"), bands * bits).as("sig"))
        val bandStructs = (0 until bands).map { b =>
          struct(lit(b).as("band"), col("sig").substr(b * bits + 1, bits).as("key"))
        }
        val probes = base.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val cand = probes.as("x").join(probes.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
        println(s"embedCandidates(bands=$bands,bits=$bits)=" +
          timed(s"cand $bands/$bits")(cand.count()))
      }
      timed("full s_embed_neardup 16/4")(
        Similarity.nearDupPairs(emb, 0.985, 0.9).count())
      timed("full s_embed_neardup 8/8")(
        Similarity.nearDupPairs(emb, 0.985, 0.9, bands = 8, bandBits = 8).count())
    }
    spark.stop()
  }
}
