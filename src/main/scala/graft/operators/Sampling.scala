package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives for training-pair construction. */
object Sampling {

  /** Deterministic NEGATIVE SAMPLING — the contrastive-training pair
    * constructor: for every fact row holding a positive `posCol` key,
    * draw a pseudo-random negative dimension key as
    * `1 + md5-hash(salt:factKeys...) mod max(dimKey)`. No RNG: the draw
    * is a pure hash of the row identity, so pairs are reproducible
    * across engines, runs, and cluster sizes; the broadcast join back
    * to `dim` proves every negative is a valid FK (and carries any
    * attribute columns `dim` was projected to). Collisions
    * (negative == positive) are flagged in the `collision` column, not
    * silently dropped — downstream resampling policy stays explicit.
    *
    * Scale shape: map-only over the fact plus two broadcasts (the
    * 1-row max-key aggregate and the dim projection) — and NO sort:
    * determinism here is per-ROW, a function of each row's identity,
    * so the operator imposes no output order and a library caller at
    * 100 TB never pays a global sort for it. Anything needing a
    * canonical order (the hash-compared verify dump) sorts at ITS
    * edge — see the `a_neg_sampling` query wrapper.
    *
    * Output: factKeys ++ (pos_key, neg_key, collision) ++ dim's other
    * columns.
    */
  def negativeSample(fact: DataFrame, dim: DataFrame,
      factKeys: Seq[String], posCol: String, dimKey: String,
      salt: String = "neg"): DataFrame = {
    val mp = dim.agg(max(col(dimKey)).as("__mp"))
    // Fused md5-prefix (graft.plans.Md5PrefixLong): same value as
    // conv(substring(md5(…), 1, 8), 16, 10).cast("long") — the recipe
    // the scaladoc and the DuckDB oracle spell — one digest, no hex /
    // conv string round-trips (optimization guide §1.2 per-task work).
    val h = graft.plans.HashOps.md5PrefixLong(concat_ws(":",
      lit(salt) +: factKeys.map(c => col(c).cast("string")): _*), 1, 8)
    fact.crossJoin(broadcast(mp))
      .select(factKeys.map(col) :+ col(posCol).as("pos_key") :+
        (lit(1L) + pmod(h, col("__mp"))).as("neg_key"): _*)
      .join(broadcast(dim.withColumnRenamed(dimKey, "__dk")),
        col("neg_key") === col("__dk"))
      .withColumn("collision", col("neg_key") === col("pos_key"))
      .drop("__dk")
  }
}
