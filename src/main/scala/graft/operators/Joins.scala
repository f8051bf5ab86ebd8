package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins.
  *
  * [[asofJoin]] — for each left row, attach the payload of the LATEST
  * right row with `right.ts <= left.ts` within the same key group (LEFT
  * semantics: unmatched lefts keep null payloads).
  *
  * Implementation is the union-window composition, not a pairwise range
  * join: tag and union both inputs, sort each key group by (ts, tag),
  * and carry the last non-null payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame. Cost is one
  * shuffle + per-key sort over (|L|+|R|) rows — linear, against the
  * range join's worst-case |L|·|R|; this is the shape that survives
  * 100 TB (and mirrors how streaming engines implement temporal joins).
  */
object Joins {

  /** Loud guard for the internal working columns the union-window
    * machinery stamps onto the LEFT input: a caller frame already
    * carrying one of these names would be silently overwritten (and
    * the join's carry corrupted) — fail fast instead, naming the
    * offenders. Cheap (driver-side schema check), zero plan cost.
    */
  private def requireNoCollision(cols: Seq[String], reserved: Seq[String],
      op: String): Unit = {
    val bad = cols.filter(reserved.contains)
    require(bad.isEmpty,
      s"$op: input column(s) [${bad.mkString(", ")}] collide with the " +
        s"join's internal working columns [${reserved.mkString(", ")}] — " +
        "rename them before the join")
  }

  /** Tie-break column as an ordering key: the deterministic-tie
    * contract needs a total order that survives the internal long
    * cast, so a non-castable type (string, array, …) is rejected loud
    * instead of silently casting to null and degrading the tie to
    * arbitrary.
    */
  private def tieBreakKey(right: DataFrame,
      rightTieBreak: Option[String]): Column =
    rightTieBreak.map { c =>
      val dt = right.schema(c).dataType
      val ok = dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.BooleanType ||
        dt == org.apache.spark.sql.types.TimestampType
      require(ok,
        s"rightTieBreak column '$c' has type ${dt.simpleString}, which " +
          "does not cast to a numeric ordering key — the deterministic " +
          "tie-break would silently become arbitrary. Use a numeric/" +
          "boolean/timestamp column (or derive one) instead.")
      col(c).cast("long")
    }.getOrElse(lit(0L))

  /** @param keys         equi-join key columns (present on both sides)
    * @param leftTs       left event-time column
    * @param rightTs      right event-time column
    * @param rightPayload right columns to attach (appended with `suffix`)
    * @param rightTieBreak column ordering simultaneous right rows — the
    *                      LAST one in this order wins (deterministic)
    * @param tolerance    pandas `merge_asof(tolerance=...)`: a match
    *                     counts only if the time gap (in the ts
    *                     column's double cast — seconds for timestamps)
    *                     is ≤ this, INCLUSIVE; a carried match outside
    *                     it nulls out, same as no match. One extra
    *                     codegen'd comparison on the carried payload —
    *                     the linear shape is unchanged.
    * @param allowExactMatches pandas `merge_asof(allow_exact_matches=
    *                     False)` when false: a right row AT the left
    *                     ts does not match — strictly before
    *                     (backward) / strictly after (forward). Pure
    *                     sort-order flip (left rows scan before
    *                     simultaneous right rows), zero extra cost.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String] = None,
      suffix: String = "_asof",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame =
    asofDirectional(left, right, keys, leftTs, rightTs, rightPayload,
      rightTieBreak, suffix, backward = true, tolerance, allowExactMatches)

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`):
    * for each left row, attach the payload of the EARLIEST right row
    * with `right.ts >= left.ts` within the key group (exact-time
    * matches included). Same linear union-window shape as [[asofJoin]]
    * — the scan simply runs time-DESCENDING, so the carried payload at
    * each left row is the smallest right ts at-or-after it.
    */
  def asofForwardJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String] = None,
      suffix: String = "_fwd",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame =
    asofDirectional(left, right, keys, leftTs, rightTs, rightPayload,
      rightTieBreak, suffix, backward = false, tolerance, allowExactMatches)

  private def asofDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String],
      suffix: String,
      backward: Boolean,
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name ≥1 column")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val payloadOut = rightPayload.map(_ + suffix)
    val leftCols = left.columns.toSeq
    requireNoCollision(leftCols, Seq("_t", "_tag", "_tie", "_payload"),
      "asofJoin")
    requireNoCollision(leftCols, payloadOut, "asofJoin (payload output)")

    // The payload travels as ONE struct column so the latest right ROW
    // wins atomically: carrying each column independently with
    // last(ignoreNulls) would let a null payload value inherit an older
    // row's value, and could stitch columns from different right rows.
    // It rides with its own event time (`__rt`) so the tolerance gate
    // can measure the matched gap after the carry.
    val r2base = right.select(
      (keys.map(col) :+ col(rightTs).as("_t")) :+
        struct((rightPayload.map(col) :+
          col(rightTs).cast("double").as("__rt")): _*).as("_payload") :+
        tieBreakKey(right, rightTieBreak).as("_tie"): _*)
      .withColumn("_tag", lit(1))
    val payloadType = r2base.schema("_payload").dataType

    val l3 = left
      .withColumn("_t", col(leftTs))
      .withColumn("_tag", lit(0))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_payload", lit(null).cast(payloadType))
    // right rows carry null for left-only columns
    val r3 = leftCols.filterNot(keys.contains).foldLeft(r2base)((df, c) =>
      df.withColumn(c, lit(null)))

    val unionCols = keys ++ leftCols.filterNot(keys.contains) ++
      Seq("_t", "_tag", "_tie", "_payload")
    val unioned = l3.select(unionCols.map(col): _*)
      .unionByName(r3.select(unionCols.map(col): _*))

    // right rows sort BEFORE left rows at equal ts (tag desc) in BOTH
    // directions, so an exactly-simultaneous right row matches
    // (backward: ts <= ts; forward: ts >= ts). With allowExactMatches
    // = false the tag order FLIPS — left rows scan before simultaneous
    // right rows, so the carry at a left row has only STRICTLY
    // earlier/later right rows (pandas allow_exact_matches=False),
    // at zero extra cost. Backward scans time ascending (carry =
    // latest right ≤ t, or < t strict); forward scans descending
    // (carry = earliest right ≥ t, or > t strict). Among simultaneous
    // right rows the tie-break MAX wins either way (last() of `_tie`
    // asc).
    val tagOrder = if (allowExactMatches) col("_tag").desc else col("_tag").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (backward) col("_t").asc else col("_t").desc,
        tagOrder, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried0 = unioned.withColumn("_payload",
      last(col("_payload"), ignoreNulls = true).over(w))

    // tolerance gate (inclusive, pandas semantics): the carried match
    // nulls out when its gap exceeds the bound — a too-old (backward)
    // or too-far-ahead (forward) right row is the same as no match.
    // The gap is non-negative by the direction invariant; a null
    // payload stays null through the comparison.
    val carried = tolerance match {
      case Some(tol) =>
        val lt = col("_t").cast("double")
        val rt = col("_payload").getField("__rt")
        val gap = if (backward) lt - rt else rt - lt
        carried0.withColumn("_payload", when(gap <= tol, col("_payload")))
      case None => carried0
    }

    val unpacked = rightPayload.zip(payloadOut).foldLeft(carried) {
      case (df, (src, out)) => df.withColumn(out, col("_payload").getField(src))
    }
    unpacked.filter(col("_tag") === 0).drop("_t", "_tag", "_tie", "_payload")
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`):
    * for each left row, attach the payload of the right row whose
    * `rightTs` is CLOSEST to `leftTs` within the key group — before or
    * after; exact-distance ties prefer the earlier (backward) right
    * row. LEFT semantics: keys with no right rows keep null payloads.
    * `allowExactMatches = false` excludes right rows AT the left ts
    * from BOTH candidate scans (pandas nearest + allow_exact_matches);
    * `tolerance` bounds the winner's absolute distance, inclusive.
    *
    * Same linear discipline as [[asofJoin]] — tag-and-union, ONE
    * shuffle on the keys, then TWO per-key sorted passes over the same
    * partitioning (the ascending scan carries the latest right ≤ t
    * forward, the descending scan carries the earliest right ≥ t
    * backward); the winner is a map-side distance comparison of the
    * two candidates. Never a pairwise range join.
    */
  def asofNearestJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String] = None,
      suffix: String = "_near",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name ≥1 column")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val payloadOut = rightPayload.map(_ + suffix)
    val leftCols = left.columns.toSeq
    requireNoCollision(leftCols,
      Seq("_t", "_tag", "_tie", "_payload", "_bwd", "_fwd", "_win"),
      "asofNearestJoin")
    requireNoCollision(leftCols, payloadOut,
      "asofNearestJoin (payload output)")
    // the payload rides with its own event time (for the distance
    // compare) as ONE struct, so each candidate row wins atomically
    val r2base = right.select(
      (keys.map(col) :+ col(rightTs).as("_t")) :+
        struct((rightPayload.map(col) :+
          col(rightTs).cast("double").as("__rt")): _*).as("_payload") :+
        tieBreakKey(right, rightTieBreak).as("_tie"): _*)
      .withColumn("_tag", lit(1))
    val payloadType = r2base.schema("_payload").dataType
    val l3 = left
      .withColumn("_t", col(leftTs))
      .withColumn("_tag", lit(0))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_payload", lit(null).cast(payloadType))
    val r3 = leftCols.filterNot(keys.contains).foldLeft(r2base)((df, c) =>
      df.withColumn(c, lit(null)))
    val unionCols = keys ++ leftCols.filterNot(keys.contains) ++
      Seq("_t", "_tag", "_tie", "_payload")
    val unioned = l3.select(unionCols.map(col): _*)
      .unionByName(r3.select(unionCols.map(col): _*))
    // right rows sort BEFORE left rows at equal ts in BOTH scans, so a
    // simultaneous right matches either way; among simultaneous right
    // rows the tie-break MAX wins in both scans (last() of `_tie` asc).
    // With allowExactMatches = false the tag order FLIPS in both scans
    // (pandas merge_asof(direction='nearest',
    // allow_exact_matches=False)): left rows scan before simultaneous
    // right rows, so the backward candidate is strictly earlier and
    // the forward candidate strictly later — same pure sort-order flip
    // as the directional joins, zero extra cost.
    val tagOrder = if (allowExactMatches) col("_tag").desc else col("_tag").asc
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, tagOrder, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, tagOrder, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_bwd", last(col("_payload"), ignoreNulls = true).over(wB))
      .withColumn("_fwd", last(col("_payload"), ignoreNulls = true).over(wF))
    val lt = col("_t").cast("double")
    val winner0 = when(col("_fwd").isNull, col("_bwd"))
      .when(col("_bwd").isNull, col("_fwd"))
      .when(lt - col("_bwd").getField("__rt") <=
        col("_fwd").getField("__rt") - lt, col("_bwd"))
      .otherwise(col("_fwd"))
    // tolerance gate (inclusive): the nearest candidate still loses if
    // its absolute distance exceeds the bound — same as no match
    val winner = tolerance match {
      case Some(tol) => when(
        abs(lt - winner0.getField("__rt")) <= tol, winner0)
      case None => winner0
    }
    val withWin = carried.withColumn("_win", winner)
    val unpacked = rightPayload.zip(payloadOut).foldLeft(withWin) {
      case (df, (src, out)) => df.withColumn(out, col("_win").getField(src))
    }
    unpacked.filter(col("_tag") === 0)
      .drop("_t", "_tag", "_tie", "_payload", "_bwd", "_fwd", "_win")
  }

  /** Binned RANGE JOIN — point-in-interval containment for the
    * BIG × BIG case neither side can broadcast.
    *
    * Spark plans a bare `p BETWEEN lo AND hi` as a nested-loop join
    * (broadcast if one side is small, else a single-partition BNLJ) —
    * the |L|·|R| shape that dies at cluster scale. The classic fix,
    * and what dedicated interval-join engines do under the hood:
    * quantize the range dimension into fixed-width BINS, replicate
    * each interval to every bin it overlaps (`sequence` over the bin
    * span — map-side, ⌈span/binWidth⌉+1 copies), tag each point with
    * its one containing bin, EQUI-join on the bin key (a plain
    * shuffle/sort-merge join both sides partition on), and keep the
    * true containment predicate as a residual filter. Correctness
    * needs no dedup: a point lives in exactly one bin, and an interval
    * appears once per bin, so each qualifying (point, interval) pair
    * meets exactly once.
    *
    * Scale shape: shuffle is |L| + |R|·replication on a key whose
    * cardinality the caller CONTROLS via `binWidth` — size it near the
    * typical interval span (replication ≈ 2×) and well below the
    * domain width (bins ≫ partitions, so no skew); AQE handles the
    * rest. Columns from both inputs must not collide (standard join
    * contract); inverted intervals (lo > hi) match nothing.
    */
  def binnedRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerRow: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoCollision(points.columns.toSeq, Seq("_bin"),
      "binnedRangeJoin (points)")
    requireNoCollision(intervals.columns.toSeq, Seq("_bin"),
      "binnedRangeJoin (intervals)")
    val pb = points.withColumn("_bin",
      floor(col(ptCol) / binWidth).cast("long"))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bin", explode(guardedBinSeq(
        col(loCol), col(hiCol), binWidth, maxBinsPerRow)))
    pb.join(ib, Seq("_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Bin span of one interval, failing FAST and loud on an interval
    * that spans vastly more bins than the `binWidth` sizing
    * anticipated: an unguarded `sequence` would balloon the row (and
    * past ~2³¹ elements die on Spark's array-length cap with an opaque
    * error) — a mis-sized `binWidth` is a plan bug the caller must fix,
    * not something to grind through. Per-row guard, codegen'd
    * comparison, zero cost on the happy path.
    */
  private def guardedBinSeq(lo: Column, hi: Column, binWidth: Double,
      maxBinsPerRow: Int): Column = {
    val loB = floor(lo / binWidth).cast("long")
    val hiB = floor(hi / binWidth).cast("long")
    when(hiB - loB < lit(maxBinsPerRow.toLong), sequence(loB, hiB))
      .otherwise(raise_error(format_string(
        "binned join: interval [%s, %s] spans %d bins at binWidth=" +
          s"$binWidth (cap $maxBinsPerRow): size binWidth near the " +
          "typical interval span, or raise maxBinsPerRow deliberately",
        lo.cast("string"), hi.cast("string"), hiB - loB + 1)))
  }

  /** Binned INTERVAL-OVERLAP join — interval × interval for the
    * BIG × BIG case, the two-sided sibling of [[binnedRangeJoin]]
    * (whose left side is points): emit every (left, right) pair whose
    * closed intervals overlap, `l.lo <= r.hi && r.lo <= l.hi`.
    *
    * Same quantize-replicate-equi-join shape — BOTH sides replicate to
    * every bin they touch — with the FIRST-OVERLAP-BIN trick replacing
    * the point's unique bin as the dedup guarantee: an overlapping
    * pair co-occurs in every bin their spans share, so the residual
    * keeps a pair only in the bin where the overlap STARTS
    * (`floor(greatest(l.lo, r.lo) / binWidth)`). Each qualifying pair
    * meets exactly once and no distinct (= no extra shuffle of the
    * output) is ever needed. Shuffle is (|L|+|R|)·replication on the
    * caller-controlled bin key; size `binWidth` near the typical span
    * (replication ≈ 2×). Inverted intervals match nothing; column
    * names must not collide across inputs.
    */
  def binnedIntervalJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Double, maxBinsPerRow: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoCollision(left.columns.toSeq, Seq("_bin"),
      "binnedIntervalJoin (left)")
    requireNoCollision(right.columns.toSeq, Seq("_bin"),
      "binnedIntervalJoin (right)")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("_bin", explode(guardedBinSeq(
        col(lo), col(hi), binWidth, maxBinsPerRow)))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), Seq("_bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("_bin") ===
        floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("_bin")
  }
}
