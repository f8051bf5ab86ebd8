package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** SemDeDup-style semantic dedup: keep/witness semantics on a
  * hand-built corpus, the pruning invariants on real data, determinism,
  * and the cluster-bounded plan shape.
  */
class SemanticDedupSpec extends SparkFunSuite {

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("keep rule: pruned iff a τ-similar smaller-id neighbor shares the cell") {
    val s = spark; import s.implicits._
    // Two orthogonal families; ids 0 and 1 seed the two cells.
    val data = Seq(
      (0L, vec(1, 0, 0, 0)),
      (1L, vec(0, 1, 0, 0)),
      (2L, vec(0.99, 0.14, 0, 0)),  // near-dup of 0 (cos ≈ 0.990)
      (3L, vec(0.10, 0.99, 0, 0)),  // near-dup of 1 (cos ≈ 0.995)
      (4L, vec(0.70, 0.71, 0.1, 0)), // between families, no near-dup
      (5L, vec(0.99, 0.141, 0, 0))  // near-dup of BOTH 0 and 2
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(data, tau = 0.98, nlist = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("vid") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[java.lang.Long]("witness"))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L)) // one row per vector
    assert(out(0L) == ((true, None)))
    assert(out(1L) == ((true, None)))
    assert(out(4L) == ((true, None)))
    assert(out(2L) == ((false, Some(0L))))
    assert(out(3L) == ((false, Some(1L))))
    // witness is the SMALLEST similar smaller-id neighbor, not just any
    assert(out(5L) == ((false, Some(0L))))
  }

  test("invariants on real embeddings: witnesses are in-cell, smaller, and τ-similar; kept rows have none") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val tau = 0.4
    val out = Dedup.semanticDedup(emb, tau = tau)
    // Independent all-pairs reference (no LSH/cell shortcut in the
    // checker beyond the cell-equality the semantics require).
    val cells = out.select(col("vid"), col("cell"))
    val e = emb.select(col("vec_id").as("vid"), col("embedding").as("v"))
      .join(cells, "vid")
    val ref = e.as("x").join(e.as("y"),
        col("x.cell") === col("y.cell") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"),
        Similarity.cosineExact(col("x.v"), col("y.v")).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("id_b").as("vid"))
      .agg(min(col("id_a")).as("ref_witness"))
    val joined = out.join(ref, Seq("vid"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val w = Option(r.getAs[java.lang.Long]("witness"))
      val rw = Option(r.getAs[java.lang.Long]("ref_witness"))
      assert(w == rw, s"vid=${r.getAs[Long]("vid")}: witness $w != reference $rw")
      assert(r.getAs[Boolean]("keep") == w.isEmpty)
    }
    // the rule actually fires on this corpus (non-vacuous test)
    assert(joined.exists(!_.getAs[Boolean]("keep")))
    assert(joined.exists(_.getAs[Boolean]("keep")))
  }

  test("deterministic: two runs produce identical rows") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run() = Dedup.semanticDedup(emb, tau = 0.4)
      .orderBy("vid").collect().toSeq
    assert(run() == run())
  }

  test("plan shape: pair search shuffles on cell, no cartesian product") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.semanticDedup(emb, tau = 0.4)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"pairing must be cell-bounded, not all-pairs:\n$plan")
      assert(plan.contains("hashpartitioning(cell"),
        s"pair search must key its exchange on cell:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
