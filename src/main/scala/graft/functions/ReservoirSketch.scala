package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (hash, value) observation feeding [[ReservoirSketch]]. */
final case class RsPair(h: Long, v: Double)

/** Sketch state: parallel arrays sorted by (h, v), at most k entries. */
final case class RsBuffer(hs: Array[Long], vs: Array[Double])

/** Deterministic fixed-"seed" reservoir sample as a typed Dataset
  * [[Aggregator]] (UDAF): keep the k rows with the SMALLEST (hash,
  * value) pairs, where the hash is an engine-portable md5 prefix of a
  * unique row key — the KMV trick applied to SAMPLING instead of
  * distinct counting ([[KmvSketch]] is the template). Because md5 is a
  * fixed public function, the "random" sample is a pure function of the
  * data: any engine computing the same recipe draws the SAME sample,
  * which is what makes downstream quantile estimates hash-checkable
  * against DuckDB (the `x_rs_quantiles` query) — the property no native
  * quantile sketch (KLL/GK with engine-internal layouts) offers.
  *
  * The buffer is bounded mergeable state: `reduce` inserts in sorted
  * order and drops past k, `merge` merge-takes-k, so partials combine
  * map-side and the shuffle carries at most k (long, double) pairs per
  * group regardless of group size — at 100 TB this replaces a global
  * per-group sort, the same shape argument as [[KmvSketch]]. Unlike KMV
  * the buffer keeps DUPLICATE (h, v) pairs: this is a row sample, not a
  * distinct-set synopsis, and the window/row_number oracle formulation
  * keeps every row too (ReservoirSketchSpec proves the two
  * formulations bit-identical).
  *
  * `finish` returns the sample's VALUES sorted ascending, ready for
  * rank-based (type-1 / "disc") quantile reads: element_at(sample,
  * ceil(q·size)). With sample size k, the sampled q-quantile deviates
  * from the true quantile's RANK by more than ε·n with probability
  * ≤ 2·exp(−2·k·ε²) (Hoeffding on the k Bernoulli(q) indicators) —
  * k = 128 puts the p50 estimate within ±12 percentile points at 95%
  * confidence; the oracle-checked `err` column reports the realized
  * value-space error against the exact disc quantile.
  */
class ReservoirSketch(k: Int)
    extends Aggregator[RsPair, RsBuffer, Array[Double]] {

  private def cmp(h1: Long, v1: Double, h2: Long, v2: Double): Int =
    if (h1 != h2) java.lang.Long.compare(h1, h2)
    else java.lang.Double.compare(v1, v2)

  override def zero: RsBuffer = RsBuffer(Array.empty, Array.empty)

  override def reduce(b: RsBuffer, p: RsPair): RsBuffer = {
    val n = b.hs.length
    // first index whose (h, v) sorts after p — binary search, keeping
    // duplicates (row-sample semantics; see class doc)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(b.hs(mid), b.vs(mid), p.h, p.v) <= 0) lo = mid + 1 else hi = mid
    }
    if (n >= k && lo >= k) b // sorts after the current k-th minimum
    else {
      val m = math.min(n + 1, k)
      val hs = new Array[Long](m)
      val vs = new Array[Double](m)
      System.arraycopy(b.hs, 0, hs, 0, lo)
      System.arraycopy(b.vs, 0, vs, 0, lo)
      hs(lo) = p.h
      vs(lo) = p.v
      System.arraycopy(b.hs, lo, hs, lo + 1, m - lo - 1)
      System.arraycopy(b.vs, lo, vs, lo + 1, m - lo - 1)
      RsBuffer(hs, vs)
    }
  }

  override def merge(a: RsBuffer, b: RsBuffer): RsBuffer = {
    val m = math.min(a.hs.length + b.hs.length, k)
    val hs = new Array[Long](m)
    val vs = new Array[Double](m)
    var i = 0
    var j = 0
    var n = 0
    while (n < m) {
      val takeA = j >= b.hs.length ||
        (i < a.hs.length && cmp(a.hs(i), a.vs(i), b.hs(j), b.vs(j)) <= 0)
      if (takeA) { hs(n) = a.hs(i); vs(n) = a.vs(i); i += 1 }
      else { hs(n) = b.hs(j); vs(n) = b.vs(j); j += 1 }
      n += 1
    }
    RsBuffer(hs, vs)
  }

  override def finish(b: RsBuffer): Array[Double] = {
    val out = b.vs.clone()
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[RsBuffer] = Encoders.product[RsBuffer]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** One (hash, value) observation feeding [[ReservoirSketchLong]]. */
final case class RsPairL(h: Long, v: Long)

/** Long-sketch state: parallel arrays sorted by (h, v), ≤ k entries. */
final case class RsBufferL(hs: Array[Long], vs: Array[Long])

/** LONG-valued twin of [[ReservoirSketch]] — identical selection
  * (k smallest (hash, value) pairs, duplicates kept, bounded mergeable
  * state) and identical value-sorted output, but the value slot is an
  * exact Long instead of a Double. This is the variant for sampling
  * IDENTIFIERS: the double-valued original is exact only to 2^53, so
  * its id-sampling caller needed a fail-fast precision guard; the long
  * slot removes that failure mode entirely (any 64-bit id round-trips
  * bit-exactly). Ordering is unchanged for the ids both variants can
  * represent — longs and their exact double images sort identically —
  * so the hash-determined membership, and therefore the DuckDB oracle
  * replay, is the same sample.
  */
class ReservoirSketchLong(k: Int)
    extends Aggregator[RsPairL, RsBufferL, Array[Long]] {

  private def cmp(h1: Long, v1: Long, h2: Long, v2: Long): Int =
    if (h1 != h2) java.lang.Long.compare(h1, h2)
    else java.lang.Long.compare(v1, v2)

  override def zero: RsBufferL = RsBufferL(Array.empty, Array.empty)

  override def reduce(b: RsBufferL, p: RsPairL): RsBufferL = {
    val n = b.hs.length
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(b.hs(mid), b.vs(mid), p.h, p.v) <= 0) lo = mid + 1 else hi = mid
    }
    if (n >= k && lo >= k) b
    else {
      val m = math.min(n + 1, k)
      val hs = new Array[Long](m)
      val vs = new Array[Long](m)
      System.arraycopy(b.hs, 0, hs, 0, lo)
      System.arraycopy(b.vs, 0, vs, 0, lo)
      hs(lo) = p.h
      vs(lo) = p.v
      System.arraycopy(b.hs, lo, hs, lo + 1, m - lo - 1)
      System.arraycopy(b.vs, lo, vs, lo + 1, m - lo - 1)
      RsBufferL(hs, vs)
    }
  }

  override def merge(a: RsBufferL, b: RsBufferL): RsBufferL = {
    val m = math.min(a.hs.length + b.hs.length, k)
    val hs = new Array[Long](m)
    val vs = new Array[Long](m)
    var i = 0
    var j = 0
    var n = 0
    while (n < m) {
      val takeA = j >= b.hs.length ||
        (i < a.hs.length && cmp(a.hs(i), a.vs(i), b.hs(j), b.vs(j)) <= 0)
      if (takeA) { hs(n) = a.hs(i); vs(n) = a.vs(i); i += 1 }
      else { hs(n) = b.hs(j); vs(n) = b.vs(j); j += 1 }
      n += 1
    }
    RsBufferL(hs, vs)
  }

  override def finish(b: RsBufferL): Array[Long] = {
    val out = b.vs.clone()
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[RsBufferL] = Encoders.product[RsBufferL]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
