package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis => TA}

/** End-to-end corpus CURATION: the composition every pre-training data
  * pipeline runs before tokenization — quality gate → exact dedup →
  * near-dup collapse → leakage-safe split — as one library call with a
  * per-stage audit trail, exposed operationally as
  * `MigrateCli --mode curate`.
  *
  * Every stage reuses the already-oracle-checked primitives, so the
  * pipeline adds composition, not new semantics:
  *  1. QUALITY: [[TextAnalysis.gopherPass]] (the `t_gopher` rules) —
  *     map-only filter.
  *  2. EXACT DEDUP: keep the smallest id per
  *     [[TextAnalysis.fingerprint]] (bag-of-words md5) — one window
  *     exchange on the fingerprint key (the near-unique-key shape
  *     `d_spans` documents: sort-agg beats hash-agg + join-back).
  *  3. NEAR-DUP COLLAPSE: [[Dedup.minhashNearDups]] band-join pairs →
  *     [[Dedup.connectedComponents]] → drop non-canonical cluster
  *     members (the `d_dedup_corpus` recipe, at LSH scale shape —
  *     candidates come from band buckets, never corpus²).
  *  4. SPLIT: [[TextAnalysis.hashSplit]] — deterministic salted-hash
  *     train/val/test bands, growth-stable, no RNG.
  *
  * The curated corpus lands at `outDir` partitioned by split (so
  * downstream readers partition-prune their split), and the returned
  * report carries the per-stage counts an audit needs. Stage
  * intermediates are persisted across their two consumers (count +
  * next stage / write) and unpersisted before return.
  */
object Curation {

  /** Per-stage audit counts of one [[curate]] run. */
  case class CurationReport(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      bySplit: Map[String, Long]) {
    def dropped: Long = input - afterNearDup
  }

  /** Run the full pipeline over `docs`, write the curated corpus to
    * `outDir` (parquet, partitioned by `split`), return the audit
    * counts. `jaccard` is the near-dup collapse threshold; `stopwords`
    * is the per-language registry the quality gate's stopword rule
    * runs against ([[TextAnalysis.gopherPassLang]] — a document needs
    * ≥2 function words of SOME registered language). The default
    * single-entry English registry reproduces the original
    * [[TextAnalysis.gopherPass]] bit-for-bit; a multilingual corpus
    * passes its language family (e.g. [[TextAnalysis.StopwordsByLang]])
    * so the gate doesn't silently zero non-English input — the r12
    * scale-probe failure mode.
    */
  def curate(docs: DataFrame, outDir: String, idCol: String = "doc_id",
      textCol: String = "text", jaccard: Double = 0.5,
      stopwords: Map[String, Seq[String]] = Map("en" -> TA.Stopwords))
      : CurationReport = {
    val input = docs.count()

    val quality = docs
      .filter(TA.gopherPassLang(col(textCol), stopwords)).persist()
    val afterQuality = quality.count()

    val wFp = Window.partitionBy(col("__fp"))
    val exact = quality
      .withColumn("__fp", TA.fingerprint(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(wFp) === col(idCol))
      .filter(col("__keep")).drop("__fp", "__keep")
      .persist()
    val afterExact = exact.count()

    val pairs = Dedup.minhashNearDups(exact, idCol, textCol, jaccard)
      .select(col("id_a"), col("id_b"))
    val drop = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val curated = exact.join(drop, Seq(idCol), "left_anti")
      .withColumn("split", TA.hashSplit(col(idCol)))
      .persist()
    val afterNearDup = curated.count()

    curated.write.mode("overwrite").partitionBy("split").parquet(outDir)
    val bySplit = curated.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    quality.unpersist(); exact.unpersist(); curated.unpersist()
    CurationReport(input, afterQuality, afterExact, afterNearDup, bySplit)
  }
}
