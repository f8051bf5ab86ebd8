package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The typed bottom-k-by-hash reservoir Aggregator (bounded mergeable
  * state) must equal the x_rs_quantiles window formulation (global
  * per-group sort on (h, v) + row_number ≤ k) bit-for-bit on the same
  * hash input — the proof the scale shape draws the same sample — and
  * its merge must be order-insensitive (partials from any split of the
  * data combine to the same sketch).
  */
class ReservoirSketchSpec extends SparkFunSuite {

  private val k = 128

  private def hashed = {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    o.select(col("o_orderstatus").as("g"),
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"),
      col("o_totalprice").as("v"))
  }

  test("reservoir UDAF sample == window-formulation sample per group") {
    val rs = udaf(new ReservoirSketch(k))
    val viaAgg = hashed.groupBy("g").agg(rs(col("h"), col("v")).as("sample"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("h"), col("v"))
    val viaQuery = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("g").agg(sort_array(collect_list(col("v"))).as("sample"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

    assert(viaAgg.keySet == viaQuery.keySet && viaAgg.nonEmpty)
    viaAgg.foreach { case (g, s) =>
      assert(s == viaQuery(g), s"sample mismatch for group $g")
      assert(s.length == k) // every sf0.001 group exceeds k rows
    }
  }

  test("merge is split-invariant: sketch(all) == merge(sketch(half1), sketch(half2))") {
    val agg = new ReservoirSketch(8)
    val pairs = (1L to 200L).map(i => RsPair(i * 7919 % 101, i / 10.0))
    val whole = pairs.foldLeft(agg.zero)(agg.reduce)
    // several split points, including skewed ones
    for (cut <- Seq(1, 50, 100, 199)) {
      val (a, b) = pairs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).toSeq == agg.finish(whole).toSeq,
        s"split at $cut diverged")
      // and merge is symmetric
      val swapped = agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(swapped).toSeq == agg.finish(whole).toSeq)
    }
  }

  test("sub-k input returns the whole multiset, sorted; duplicates kept") {
    val agg = new ReservoirSketch(10)
    val pairs = Seq(RsPair(5, 2.0), RsPair(3, 9.0), RsPair(5, 2.0),
      RsPair(1, 4.0))
    val out = agg.finish(pairs.foldLeft(agg.zero)(agg.reduce)).toSeq
    assert(out == Seq(2.0, 2.0, 4.0, 9.0)) // duplicate (5, 2.0) survives
  }

  test("quantile reads off the sample are within the Hoeffding rank band") {
    // k = 128, δ = 0.05 → ε = sqrt(ln(2/δ)/(2k)) ≈ 0.12: the sampled
    // p50's TRUE rank should sit within ~±12 percentile points. A
    // deterministic check (md5 fixes the sample), generous margin ×1.5.
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val n = o.count()
    val rs = udaf(new ReservoirSketch(k))
    val est = hashed.select(lit(1).as("g"), col("h"), col("v"))
      .groupBy("g").agg(rs(col("h"), col("v")).as("sample"))
      .select(element_at(col("sample"),
        ceil(lit(0.5) * least(lit(n), lit(k))).cast("int")).as("p50"))
      .collect().head.getDouble(0)
    val trueRank = o.filter(col("o_totalprice") <= est).count().toDouble / n
    assert(math.abs(trueRank - 0.5) < 0.18,
      s"sampled p50 $est has true rank $trueRank")
  }

  test("long variant draws the same sample as the double variant on small ids") {
    val dAgg = new ReservoirSketch(8)
    val lAgg = new ReservoirSketchLong(8)
    val ids = (1L to 200L).map(i => (i * 7919 % 101, i))
    val viaD = dAgg.finish(ids.foldLeft(dAgg.zero)((b, p) =>
      dAgg.reduce(b, RsPair(p._1, p._2.toDouble)))).toSeq.map(_.toLong)
    val viaL = lAgg.finish(ids.foldLeft(lAgg.zero)((b, p) =>
      lAgg.reduce(b, RsPairL(p._1, p._2)))).toSeq
    assert(viaD == viaL && viaL.size == 8)
  }

  test("long variant round-trips ids beyond 2^53 exactly") {
    // the double slot is exact only to 2^53: these three ids collapse
    // to the SAME double, so the double variant cannot distinguish
    // them — the long variant must keep all three bit-exact
    val big = 9007199254740992L // 2^53
    val ids = Seq(big, big + 1, big + 3)
    assert(ids.map(_.toDouble).distinct.size < ids.size,
      "test premise: the ids must collide as doubles")
    val agg = new ReservoirSketchLong(8)
    val out = agg.finish(ids.zipWithIndex.foldLeft(agg.zero)((b, p) =>
      agg.reduce(b, RsPairL(p._2.toLong, p._1)))).toSeq
    assert(out == Seq(big, big + 1, big + 3))
    // merge path preserves them too
    val (a, b) = ids.splitAt(1)
    val merged = agg.merge(
      a.foldLeft(agg.zero)((s, v) => agg.reduce(s, RsPairL(0L, v))),
      b.foldLeft(agg.zero)((s, v) => agg.reduce(s, RsPairL(1L, v))))
    assert(agg.finish(merged).toSeq == Seq(big, big + 1, big + 3))
  }
}
