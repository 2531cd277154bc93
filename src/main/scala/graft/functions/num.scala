package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, shiftleft, shiftright}

/** Numeric helpers shared across operators and the query surface. */
object num {

  /** Engine-portable d-decimal rounding: floor(x*10^d + 0.5)/10^d.
    *
    * Unlike round(), whose half-way semantics differ between Spark
    * (shortest-decimal-repr HALF_UP) and DuckDB (binary-double round)
    * exactly on the .xx..5 boundaries that exact sums and integer
    * ratios land on, this is identical double math in every engine.
    * Half-up-toward-+inf for negatives; callers here round
    * non-negative measures. Requires |x|*10^d < 2^53.
    */
  def fround(c: Column, d: Int): Column = {
    val m = math.pow(10, d)
    floor(c * lit(m) + lit(0.5)) / lit(m)
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer shift/mask arithmetic — stays
    * in whole-stage codegen and reproduces bit-for-bit in any engine.
    * 2·bits ≤ 62 keeps the result in a positive BIGINT.
    *
    * Sorting by the z-value gives a layout where RANGES of the
    * interleaved value are small rectangles in (a, b) space — so
    * min/max file statistics prune scans on EITHER dimension, where a
    * lexicographic (a, b) sort prunes only on `a`
    * (see [[graft.sources.Sources.writeZOrdered]]).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }
}
