package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives: explicit key salting for aggregations
  * and joins over low-cardinality / heavy-hitter keys.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) splits
  * oversized SHUFFLE PARTITIONS at runtime, but it cannot help when the
  * logical key domain itself is tiny (e.g. grouping 100 TB of events by
  * a 6-value `event_type`): however partitions are split, a hash
  * exchange on the raw key can use at most |domain| reducers, so 6
  * tasks own the whole shuffle while the other 994 executors idle.
  * Salting fixes this at the PLAN level:
  *
  *  - Aggregation: group by (key, salt) first — `buckets`× more
  *    reducers, each partial map-side combined — then re-aggregate the
  *    (tiny) salted partials by key. Works for any algebraic aggregate
  *    (count/sum/min/max; avg as sum+count).
  *  - Join: salt the fact's key, REPLICATE the small side once per
  *    salt bucket, join on (key, salt). The fact — the side too big to
  *    broadcast and too skewed to hash-partition — now spreads over
  *    `buckets × |domain|` reducers; the replicated side grows only
  *    `buckets ×` (it is small by assumption — a dim that is ALSO huge
  *    and skewed is the one shape salting cannot save; pre-bucketing
  *    per SCALING.md is the answer there).
  *
  * The salt is `pmod(xxhash64(seed), buckets)` over a high-cardinality
  * seed column (a row id) — deterministic for a given row, uniform over
  * buckets, and never leaves the plan: results aggregate the salt away,
  * so the oracle twin is the plain unsalted query.
  */
object Skew {

  /** Uniform deterministic salt in [0, buckets). */
  def salt(seed: Column, buckets: Int): Column =
    pmod(xxhash64(seed), lit(buckets.toLong))

  /** Two-phase salted aggregation: `df.groupBy(key, salt).agg(partials)`
    * then `groupBy(key).agg(finals)`. The caller supplies matching
    * partial/final aggregate lists (algebraic aggregates only — the
    * final list re-aggregates the partial columns by name).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], seed: Column, buckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", salt(seed, buckets))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join of a huge skewed `fact` against a small `dim` on
    * `key`: the dim side is replicated once per salt bucket (explode of
    * a `sequence` literal — no shuffle, the replication happens map-side
    * on the dim's partitions), the fact side gets a deterministic salt
    * from `seed`, and the join key becomes (key, salt). Inner joins
    * only (replication would multiply unmatched outer rows).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      seed: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(seed, buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
