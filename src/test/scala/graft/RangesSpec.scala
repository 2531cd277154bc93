package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Ranges

/** Binned range join: result parity with the naive theta-join, plan
  * parity with an equi-join (no nested loop), bin-boundary edges.
  */
class RangesSpec extends AnyFunSuite {
  import SparkHarness._
  import spark.implicits._

  private def points: DataFrame =
    (0L until 200L).map(i => (i, i * 7L % 1000L)).toDF("pid", "t")
  private def intervals: DataFrame =
    Seq((1L, 0L, 100L), (2L, 95L, 105L), (3L, 100L, 100L), // empty
        (4L, 990L, 2000L), (5L, 110L, 90L),                // negative
        (6L, 999L, 1001L))
      .toDF("iid", "s", "e")

  private def naive: Set[(Long, Long)] =
    points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rangeJoinBinned matches the naive theta-join, incl. empty/negative intervals and boundary bins") {
    for (w <- Seq(1L, 7L, 100L, 1000L, 5000L)) {
      val got = Ranges.rangeJoinBinned(points, "t", intervals, "s", "e", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("rangeJoinBinned emits each qualifying pair exactly once") {
    val rows = Ranges.rangeJoinBinned(points, "t", intervals, "s", "e", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
  }

  test("rangeJoinBinned plans a hash/merge equi-join, never a nested loop") {
    val plan = Ranges.rangeJoinBinned(points, "t", intervals, "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // while the naive form IS the nested loop the operator exists to avoid
    val naivePlan = points
      .join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
  }

  test("rangeJoinBinned handles negative epochs (floor, not truncate-toward-zero)") {
    val p = Seq((1L, -5L), (2L, -10L), (3L, 0L)).toDF("pid", "t")
    val iv = Seq((1L, -10L, 0L)).toDF("iid", "s", "e")
    val got = Ranges.rangeJoinBinned(p, "t", iv, "s", "e", 7L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("rangeJoinBinned rejects overlapping column names and bad binWidth") {
    intercept[IllegalArgumentException] {
      Ranges.rangeJoinBinned(points, "t",
        intervals.withColumnRenamed("iid", "pid"), "s", "e", 10L)
    }
    intercept[IllegalArgumentException] {
      Ranges.rangeJoinBinned(points, "t", intervals, "s", "e", 0L)
    }
  }
}
