package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Asof
import graft.tables.Tables

/** The tier-(c) extension: as-of join as a custom LogicalPlan +
  * Strategy + SparkPlan (graft.plans.AsofJoin*), exercised on the
  * real events table and checked against a compositional ground
  * truth (join + groupBy max), which is itself the q16 semantic.
  */
class AsofPlanSpec extends AnyFunSuite {
  import SparkHarness._
  import spark.implicits._

  private def sides() = {
    val e = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts_ms")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ms")).distinct()
    (purchases, views)
  }

  test("plan-backed as-of join matches the compositional ground truth") {
    val (purchases, views) = sides()
    val got = Asof.asofJoin(purchases, views,
        Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
      .select(col("event_id"), col("ts_ms_r").as("last_view_ms"))
      .orderBy("event_id").collect().toSeq
    val expected = purchases
      .join(views.select(col("user_id").as("vuid"), col("ts_ms").as("vts")),
        col("user_id") === col("vuid") && col("vts") <= col("ts_ms"), "left")
      .groupBy("event_id").agg(max("vts").as("last_view_ms"))
      .orderBy("event_id").collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("plans as AsofJoinExec (sort-merge requirements, no union/window)") {
    val (purchases, views) = sides()
    val df = Asof.asofJoin(purchases, views,
      Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"custom exec missing from plan:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
  }

  test("as-of join is partitioning-invariant") {
    val (purchases, views) = sides()
    val a = Asof.asofJoin(purchases, views, Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
      .select("event_id", "ts_ms_r").orderBy("event_id").collect().toSeq
    val b = Asof.asofJoin(purchases.repartition(13), views.repartition(5),
        Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
      .select("event_id", "ts_ms_r").orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("null keys never match; empty right side yields all-null attachments") {
    val left = Seq((Some(1L), 10L, 100L), (None, 11L, 100L), (Some(2L), 12L, 50L))
      .toDF("k", "id", "t")
    val right = Seq((Some(1L), 90L), (None, 95L)).toDF("k", "t")
    val got = Asof.asofJoin(left, right, Seq(("k", "k")), "t", "t")
      .select("id", "t_r").orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // id 10: k=1, right(1, 90) <= 100 → 90; id 11: null key → no match;
    // id 12: k=2, no right group → no match
    assert(got == Seq(10L -> 90L, 11L -> -1L, 12L -> -1L))
    val emptyRight = Seq.empty[(Option[Long], Long)].toDF("k", "t")
    val got2 = Asof.asofJoin(left, emptyRight, Seq(("k", "k")), "t", "t")
      .select("t_r").collect()
    assert(got2.length == 3 && got2.forall(_.isNullAt(0)))
  }

  test("bucketed (key, time)-sorted inputs as-of join with no exchange") {
    val (purchases, views) = sides()
    for (t <- Seq("asof_p", "asof_v")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    graft.sources.Sources.writeBucketed(purchases, "asof_p", Seq("user_id"), 4,
      sortCols = Seq("user_id", "ts_ms"))
    graft.sources.Sources.writeBucketed(views, "asof_v", Seq("user_id"), 4,
      sortCols = Seq("user_id", "ts_ms"))
    val df = Asof.asofJoin(spark.table("asof_p"), spark.table("asof_v"),
      Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bucketed as-of join still exchanges:\n$p")
    // same rows as the unbucketed path
    val a = df.select("event_id", "ts_ms_r").orderBy("event_id").collect().toSeq
    val b = Asof.asofJoin(purchases, views, Seq(("user_id", "user_id")), "ts_ms", "ts_ms")
      .select("event_id", "ts_ms_r").orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("null right times are skipped, never block their key group") {
    // NullsFirst ordering sorts null-time right rows to the HEAD of
    // each key group; the merge must skip them (null can't satisfy
    // rt <= lt), not stop — stopping would null out every left row of
    // the group even when later right rows match
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 10L, 200L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, Option.empty[Long]), (1L, Some(5L)), (1L, Some(15L)),
        (2L, Option.empty[Long]))
      .toDF("k", "ts")
    val got = Asof.asofJoin(left, right, Seq(("k", "k")), "ts", "ts")
      .select(col("lid"), col("ts_r"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(got == Seq((100L, Some(5L)), (101L, Some(15L)), (200L, None)))
    // nullable LEFT time: a null left time matches nothing
    val leftN = Seq((1L, Option.empty[Long], 300L), (1L, Some(20L), 301L))
      .toDF("k", "ts", "lid")
    val gotN = Asof.asofJoin(leftN, right, Seq(("k", "k")), "ts", "ts")
      .select(col("lid"), col("ts_r"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(gotN == Seq((300L, None), (301L, Some(15L))))
  }

  test("right-suffix collisions with left columns are rejected up front") {
    val left = Seq((1L, 10L, 5L)).toDF("k", "ts", "ts_r")
    val right = Seq((1L, 5L)).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      Asof.asofJoin(left, right, Seq(("k", "k")), "ts", "ts")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("ties on time are inclusive and the latest right row wins") {
    val left = Seq((1L, 100L, 100L)).toDF("k", "id", "t")
    val right = Seq((1L, 50L, 7L), (1L, 100L, 8L), (1L, 101L, 9L)).toDF("k", "t", "v")
    val got = Asof.asofJoin(left, right, Seq(("k", "k")), "t", "t")
      .select("t_r", "v_r").head()
    assert(got.getLong(0) == 100L && got.getLong(1) == 8L)
  }
}
