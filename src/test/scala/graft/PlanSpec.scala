package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the scale posture (SURVEY.md §4) is asserted,
  * not assumed. Each test pins a plan property that matters at 100 TB
  * — filter/column pushdown into the parquet scan, broadcast joins
  * for dims, partial (map-side) aggregation, no cartesian products.
  */
class PlanSpec extends AnyFunSuite {
  import SparkHarness._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q1 pushes the shipdate filter and prunes columns at the scan") {
    val p = physical(run("q1_pricing_summary"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [*IsNotNull(l_shipdate)"),
      s"no pushed filter in:\n$p")
    // projection needs 7 lineitem columns; the scan must not read more
    val readSchema = "ReadSchema: struct<" +
      "l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate"
    assert(p.contains("l_returnflag") && !p.contains("l_orderkey:"),
      s"column pruning failed (l_orderkey read but unused):\n$p")
  }

  test("q4 dim enrichment uses broadcast joins, no shuffle of the fact side") {
    val p = physical(run("q4_dim_enrich"))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("q15 star join broadcasts all three dims") {
    val p = physical(run("q15_market_share"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast joins:\n$p")
  }

  test("q1/q11 aggregations are partial (map-side combine before shuffle)") {
    for (q <- Seq("q1_pricing_summary", "q11_hourly_rollup")) {
      val p = physical(run(q))
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q missing partial aggregation:\n$p")
    }
  }

  test("no query plans a cartesian product") {
    for ((name, fn) <- SparkEntry.queries) {
      val p = physical(fn(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("q1 and q2 stay inside whole-stage codegen") {
    for (q <- Seq("q1_pricing_summary", "q2_time_derive")) {
      val df = run(q)
      // AQE only finalizes (and codegens) the plan on execution, and
      // count() would plan a different query — collect this one.
      df.collect()
      val p = physical(df)
      // codegen spans render as "*(n) Operator" in the plan string
      assert(p.contains("*(1)"), s"$q not codegen'd:\n$p")
    }
  }
}
