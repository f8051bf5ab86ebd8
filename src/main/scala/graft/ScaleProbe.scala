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
    if (what == "stages") {
      val docs = Sources.table(spark, sfDir, "documents")
      val rel = Dedup.shingleRelation(docs, "doc_id", "text")
      timed("rel scan")(rel.count())
      val sigs = rel.groupBy(col("id")).agg(
        (0 until 12).map(i =>
          min(md5(concat(col("shingle"), lit(":" + i)))).as(s"m$i")).head,
        (0 until 12).map(i =>
          min(md5(concat(col("shingle"), lit(":" + i)))).as(s"m$i")).tail: _*)
      timed("signatures agg")(sigs.count())
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
