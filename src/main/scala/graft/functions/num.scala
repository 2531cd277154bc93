package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

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
}
