package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Dataset
  * [[Aggregator]] (UDAF) — the bounded-mergeable-state form of the
  * `x_kmv_distinct` query: the buffer holds at most k sorted distinct
  * hashes, `reduce` inserts, `merge` merge-takes-k, so the shuffle
  * carries k longs per group regardless of group size. At 100 TB this is
  * the shape that replaces the query's global per-group sort: partial
  * sketches combine map-side and across executors.
  *
  * The estimate is `(k-1) · 2³² / kth-smallest-hash` for ≥ k distinct
  * hashes, and the exact distinct count below k (standard KMV
  * convention). Given the same engine-portable hash input (md5-prefix,
  * see the x_kmv_distinct query), the result is deterministic and equals
  * the query formulation bit-for-bit — KmvSketchSpec proves it.
  */
final case class KmvBuffer(hashes: Array[Long])

class KmvSketch(k: Int) extends Aggregator[Long, KmvBuffer, Double] {

  override def zero: KmvBuffer = KmvBuffer(Array.empty)

  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = {
    val a = b.hashes
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (a.length >= k && ins >= k) b // larger than the current k-th min
      else {
        val out = new Array[Long](math.min(a.length + 1, k))
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, out.length - ins - 1)
        KmvBuffer(out)
      }
    }
  }

  override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = {
    // merge two sorted distinct arrays, keep the k smallest
    val (a, b) = (x.hashes, y.hashes)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    var first = true
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val t = a(i); i += 1; t }
        else { val t = b(j); j += 1; t }
      if (first || v != last) { out(n) = v; n = n + 1; last = v; first = false }
    }
    KmvBuffer(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def finish(b: KmvBuffer): Double =
    if (b.hashes.length < k) b.hashes.length.toDouble
    else (k - 1).toDouble * 4294967296.0 / b.hashes.last.toDouble

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
