package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the numeric
  * complement to [[Dedup.connectedComponents]]' structural clustering.
  *
  * PageRank (Page, Brin, Motwani, Winograd 1999, "The PageRank
  * citation ranking") here drives DATA-CURATION weighting: rank the
  * nodes of a similarity / co-occurrence graph (documents sharing
  * near-dup clusters, parts co-sourced with suppliers, pages linking
  * pages) so sampling can favor central, well-connected items — the
  * link-analysis quality prior web-corpus pipelines apply before
  * training.
  *
  * Arithmetic is FIXED-POINT INTEGER end to end: ranks are micro-units
  * of `scale` (default 1e12), every division is a trunc division of
  * non-negative longs, and every per-node update is a sum of exact
  * integers — no float appears anywhere, so the result is
  * bit-reproducible across engines and partitionings (float summation
  * order would otherwise make a hash-checked oracle impossible). The
  * floor steps drop ≤1 micro-unit of mass per node per iteration —
  * deterministic, documented, and irrelevant at 1e12 scale.
  */
object Graph {

  /** Fixed-point PageRank over a DIRECTED edge list `(src, dst)`.
    *
    * Contract: every node must appear as a `src` (out-degree ≥ 1).
    * Symmetrized (undirected) graphs satisfy this by construction; a
    * dangling node would silently LEAK its mass each iteration, so by
    * default the build fails fast on one (`validateDangling` runs a
    * one-time anti-join — one |E| shuffle, amortized over the
    * iterations; disable for graphs known symmetric).
    *
    * Execution shape (the Pregel loop, declaratively):
    *  - The edge relation is loop-INVARIANT but consumed once per
    *    iteration, so it is materialized ONCE to a scratch parquet
    *    with the out-degree denormalized on — each iteration re-scans
    *    a slim 3-column file instead of re-running the dedup/degree
    *    shuffles (the q_recursive / reliable-checkpoint shape: lineage
    *    roots at a file, executor loss re-reads instead of failing).
    *  - Each iteration is one shuffle join (edges ⋈ ranks on src) and
    *    one map-combined sum to dst — O(|E|) per round, the minimum
    *    any push-style PageRank pays. Ranks never collect: the rank
    *    table is a DataFrame of |V| rows throughout, so the loop works
    *    at any |V| a cluster can shuffle.
    *  - Lineage grows linearly with `iters`; for the tens-of-rounds
    *    regime checkpoint every ~10 rounds, exactly as
    *    [[Dedup.connectedComponents]] documents for pointer doubling.
    *
    * Per-iteration update, all in longs:
    *   contrib(u→v) = r(u) div outdeg(u)
    *   r'(v) = base + (85 · Σ contrib) div 100,   base = (15·r₀) div 100
    * with r₀ = scale div |V| — i.e. damping 0.85 with the uniform
    * teleport term frozen at its initial-mass value (rank mass then
    * stays ≈ scale without needing a global re-normalization pass per
    * round).
    *
    * @return (node, r) — r in micro-units of `scale`.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L,
      validateDangling: Boolean = true): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val spark = edges.sparkSession
    val scratch = graft.sources.Scratch.dir("pagerank",
      java.util.UUID.randomUUID().toString)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    if (validateDangling) {
      val dangling = edges.select(col("dst")).distinct()
        .join(deg, col("dst") === col("src"), "left_anti")
      require(dangling.isEmpty,
        "pageRank contract: every node needs an out-edge — " +
          "symmetrize the graph or drop dangling sinks first")
    }
    edges.join(deg, "src").select("src", "dst", "deg")
      .write.mode("overwrite").parquet(s"$scratch/edges")
    deg.select(col("src").as("node"), col("deg"))
      .write.mode("overwrite").parquet(s"$scratch/nodes")
    val ed = spark.read.parquet(s"$scratch/edges")
    val nodes = spark.read.parquet(s"$scratch/nodes")
    // |V| is O(1) driver model state (a single count), same class as
    // the collected centroid seeds in Similarity.trainCentroidsLiteral.
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    val r0 = scale / n
    val base = (15L * r0) / 100L
    var rank = nodes.select(col("node"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      val sums = ed
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .withColumnRenamed("dst", "node")
      rank = nodes.select("node")
        .join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
    }
    rank
  }
}
