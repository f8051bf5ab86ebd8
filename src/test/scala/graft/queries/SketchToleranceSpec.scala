package graft.queries

import graft.{SparkEntry, SparkFunSuite}

/** Tolerance checks for the two `no_oracle` queries. `x_approx_distinct`
  * and `x_approx_quantiles` cannot be DuckDB-hash-checked (HLL and
  * approx-percentile internals are engine-specific), so the driver records
  * only a rows-only check for them. This spec closes that gap at the spec
  * level: each estimate must land within its documented error bound of the
  * exact twin (`q_distinct_agg`, `a_percentile`) on the same input. Both
  * sketches are deterministic for a fixed input, so these are stable
  * assertions, not flaky probabilistic ones.
  */
class SketchToleranceSpec extends SparkFunSuite {

  test("x_approx_distinct lands within HLL rsd bounds of q_distinct_agg") {
    val approx = SparkEntry.queries("x_approx_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = SparkEntry.queries("q_distinct_agg")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    // approx_count_distinct default rsd = 0.05; the l_suppkey column uses
    // rsd = 0.01. rsd is one standard deviation of relative error — allow
    // 4 sigma so the bound is meaningful but never brittle.
    exact.foreach { case (flag, (nParts, nSupps)) =>
      val (aParts, aSupps) = approx(flag)
      assert(math.abs(aParts.toDouble / nParts - 1) <= 4 * 0.05,
        s"$flag parts: approx $aParts vs exact $nParts")
      assert(math.abs(aSupps.toDouble / nSupps - 1) <= 4 * 0.01,
        s"$flag supps: approx $aSupps vs exact $nSupps")
    }
  }

  test("x_approx_quantiles lands within rank tolerance of a_percentile") {
    val approx = SparkEntry.queries("x_approx_quantiles")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = SparkEntry.queries("a_percentile")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    // approx_percentile's contract is a RANK bound (accuracy=10000 →
    // rank error ≤ N/10000, i.e. exact at this SF's group sizes), while
    // the exact twin interpolates BETWEEN order statistics
    // (percentile/quantile_cont) — so value equality can still differ by
    // one inter-order-statistic gap. A 2% relative-value band covers that
    // interpolation gap comfortably on o_totalprice's distribution
    // without ever masking a wrong-percentile bug (adjacent percentiles
    // differ by far more than 2%).
    exact.foreach { case (status, ps) =>
      approx(status).zip(ps).zipWithIndex.foreach { case ((a, e), i) =>
        assert(math.abs(a / e - 1) <= 0.02,
          s"$status p${Seq(50, 90, 99)(i)}: approx $a vs exact $e")
      }
    }
  }
}
