package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without an equi key.
  *
  * A raw `points JOIN intervals ON start <= p AND p < end` has no
  * equi-condition, so Spark plans it as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(points × intervals) comparisons, the classic
  * scale-killer for "events inside incident windows" queries. The
  * binned form derives an equi key both sides agree on: bin index
  * `floor(t / binWidth)`. Points carry their single bin; intervals
  * explode into every bin they overlap. Joining on the bin turns the
  * theta-join into a shuffled (or broadcast) HASH join, and the exact
  * range predicate re-applied after the join removes same-bin
  * non-matches. Each qualifying (point, interval) pair meets in
  * EXACTLY one bin — the point's — so no post-join dedup is needed.
  */
object Ranges {

  /** Floor division as exact integer arithmetic: `c` minus its
    * positive mod is an exact multiple of `w`, so SQL's truncating
    * `div` equals floor for negative epochs too (and nothing routes
    * through double, which loses ulps above 2^53 — nanosecond epochs
    * are ~2^60).
    */
  private def binOf(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w)).cast("long")

  /** All (point, interval) pairs with `start <= point < end`
    * (half-open, epoch-ms or any consistent long unit), as an
    * equi-join on the derived bin key.
    *
    * `binWidth` prices the trade: each interval emits
    * `len/binWidth + 1` bin rows (fan-out), and each bin co-locates
    * its points with its intervals (selectivity of the residual
    * filter). Set it to the TYPICAL interval length — intervals then
    * emit 1-2 bins and a bin holds one interval-length of points.
    * Degenerate (empty/negative) intervals are dropped before the
    * explode: Spark's `sequence(lo, hi)` DESCENDS when hi < lo, which
    * would otherwise fabricate bins for intervals that can match
    * nothing.
    *
    * Scale shape: one shuffle per side on the bin key (broadcast if
    * the interval side is small), fan-out bounded by len/binWidth,
    * no nested-loop anywhere. Skewed bins (a flash-crowd bin holding
    * far more points than others) are ordinary join skew — AQE's
    * skew-join split applies, or salt via [[Skew.saltedJoin]] on the
    * bin column.
    */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint; both carry $overlap")
    val p = points.withColumn("__gr_bin", binOf(col(pointCol), binWidth))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__gr_bin", explode(sequence(
        binOf(col(startCol), binWidth), binOf(col(endCol) - 1, binWidth))))
    p.join(iv, Seq("__gr_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__gr_bin")
  }
}
