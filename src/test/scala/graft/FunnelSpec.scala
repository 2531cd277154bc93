package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Funnel

/** Ordered-funnel semantics: strict min-chaining (stage k only after
  * stage k−1), NULL cascade past a missed stage, same-timestamp
  * non-advancement, and the one-shuffle plan contract.
  */
class FunnelSpec extends AnyFunSuite {
  import SparkHarness._
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, String, Long)]) =
    Funnel.stages(rows.toDF("user_id", "event_type", "ts_ms"),
        "user_id", "event_type", "ts_ms", steps)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq

  test("strict ordering, NULL cascade, and out-of-order events") {
    val got = run(Seq(
      // u1: clean conversion — earliest qualifying event per stage
      (1L, "view", 10L), (1L, "click", 20L), (1L, "click", 15L),
      (1L, "purchase", 30L),
      // u2: purchase BEFORE the click chain resolves → no conversion
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L),
      // u3: no click at all → purchase after view still must not count
      (3L, "view", 10L), (3L, "purchase", 30L),
      // u4: no funnel events → row with all NULLs
      (4L, "error", 10L)))
    assert(got == Seq(
      (1L, 10L, 15L, 30L),
      (2L, 10L, 20L, -1L),
      (3L, 10L, -1L, -1L),
      (4L, -1L, -1L, -1L)), s"got $got")
  }

  test("same timestamp does not advance a stage; a later event does") {
    val got = run(Seq(
      (1L, "view", 10L), (1L, "click", 10L), (1L, "click", 11L),
      (1L, "purchase", 11L), (1L, "purchase", 12L)))
    assert(got == Seq((1L, 10L, 11L, 12L)), s"got $got")
  }

  test("summary counts stages and guards zero denominators") {
    val stages = Funnel.stages(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "click", 20L),
      (3L, "view", 10L),
      (4L, "error", 1L)).toDF("user_id", "event_type", "ts_ms"),
      "user_id", "event_type", "ts_ms", steps)
    val got = Funnel.summary(stages, steps).orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1, "view", 3L, 0.75), (2, "click", 2L, 0.6667),
      (3, "purchase", 1L, 0.5)), s"got $got")
    // zero entities reach stage 1 → downstream rates are NULL, not NaN
    val none = Funnel.stages(Seq((1L, "error", 1L)).toDF("user_id", "event_type", "ts_ms"),
      "user_id", "event_type", "ts_ms", steps)
    val z = Funnel.summary(none, steps).orderBy("stage").collect()
    assert(z.map(_.getLong(2)).toSeq == Seq(0L, 0L, 0L))
    assert(z.drop(1).forall(_.isNullAt(3)), s"expected NULL rates, got ${z.toSeq}")
  }

  test("one hash exchange serves every window and the final collapse") {
    val e = graft.tables.Tables(spark, "/root/testdata/sf0.01").events
      .select(col("user_id"), col("event_type"), unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
    val df = Funnel.stages(e, "user_id", "event_type", "ts_ms", steps)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    // AQE prints the plan twice (final + initial) — require one per print
    assert(hashEx <= 2, s"expected a single reused hash exchange, plan:\n$plan")
    assert("Window".r.findAllIn(plan).nonEmpty)
  }

  test("mergeRollups: merge of arbitrary disjoint slices equals the one-shot rollup") {
    import graft.ops.Enrich
    val events = Seq.tabulate(60) { i =>
      (new java.sql.Timestamp(1700000000000L + i * 180000L),
        if (i % 2 == 0) "a" else "b", (i % 7) + 0.25)
    }.toDF("ts", "event_type", "value")
    def served(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type", "hb_ms").collect().toSeq
    val oneShot = served(Enrich.mergeRollups(Seq(
      Enrich.hourlyRollupState(events, "ts", "event_type", "value"))))
    // three-way split on an arbitrary predicate, merged
    val s1 = events.filter(col("value") < 2.0)
    val s2 = events.filter(col("value") >= 2.0 && col("value") < 5.0)
    val s3 = events.filter(col("value") >= 5.0)
    val merged = served(Enrich.mergeRollups(Seq(s1, s2, s3).map(
      Enrich.hourlyRollupState(_, "ts", "event_type", "value"))))
    assert(merged == oneShot)
    // empty slices are identity elements
    val withEmpty = served(Enrich.mergeRollups(Seq(events, events.limit(0)).map(
      Enrich.hourlyRollupState(_, "ts", "event_type", "value"))))
    assert(withEmpty == oneShot)
  }

  test("histogram: hand-computed bins incl. empty bins, max-edge clamp, zero-width group") {
    import graft.ops.Enrich
    val df = Seq(
      ("a", 0.0), ("a", 0.0), ("a", 2.5), ("a", 10.0),  // range [0,10], w=2.5
      ("b", 7.0), ("b", 7.0)                             // zero-width
    ).toDF("event_type", "value")
    val got = Enrich.histogram(df, "event_type", "value", bins = 4)
      .orderBy("grp", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
    // a: bin0 [0,2.5) holds the two 0.0s; 2.5 lands in bin1; 10.0
    // clamps into bin3; bin2 is EMPTY but present
    assert(got == Seq(
      ("a", 0, 0.0, 2L), ("a", 1, 2.5, 1L), ("a", 2, 5.0, 0L), ("a", 3, 7.5, 1L),
      ("b", 0, 7.0, 2L), ("b", 1, 7.0, 0L), ("b", 2, 7.0, 0L), ("b", 3, 7.0, 0L)))
  }

  test("numericProfile: hand-computed stats incl. nulls and the n<2 stddev guard") {
    import graft.ops.Enrich
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(7.5))
    ).toDF("event_type", "value")
    val got = Enrich.numericProfile(df, "event_type", "value")
      .orderBy("grp").collect()
    val a = got(0)
    assert((a.getString(0), a.getLong(1), a.getLong(2)) == ("a", 4L, 1L))
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 3.0)
    assert(a.getDouble(5) == 2.0)                   // mean
    assert(a.getDouble(6) == 1.0)                   // sample stddev of 1,2,3
    assert(a.getDouble(7) == 2.0)                   // p50
    assert(a.getDouble(8) == 2.8)                   // p90 = 1 + 1.8
    val b = got(1)
    assert(b.getLong(1) == 1L && b.isNullAt(6), "n=1 group must have NULL stddev")
    assert(b.getDouble(5) == 7.5 && b.getDouble(7) == 7.5)
  }

  test("numericProfile: squares are exact at scale 8 for full-4dp values") {
    import graft.ops.Enrich
    // chosen so the EXACT scale-8 square sum and a 6dp-HALF_UP-rounded
    // square sum (what decimal(28,4)*decimal(28,4) under Spark's
    // allowPrecisionLoss rule would produce) diverge at the 6dp output:
    // exact v_std = 0.761929, the lossy path gives 0.761928. events
    // data carries only 2 fractional digits, so this datum is the gate.
    val df = Seq(("a", 0.9715), ("a", 0.4525), ("a", 1.9528))
      .toDF("event_type", "value")
    val got = Enrich.numericProfile(df, "event_type", "value").collect()(0)
    assert(got.getDouble(6) == 0.761929,
      s"v_std must use exact scale-8 squares, got ${got.getDouble(6)}")
  }

  test("numericProfile: a decimal(18,4)-overflowing value drops from EVERY " +
      "derived stat consistently, lands in n_null, stays visible in min/max") {
    import graft.ops.Enrich
    // 1e15 has 16 integer digits — its decimal(18,4) cast nulls under
    // non-ANSI Spark. Pre-fix, the row dropped from s2 (squares) but
    // not from s/n_v, silently corrupting v_std; now it is nulled out
    // of mean/std/percentiles together (counted in n_null), while raw
    // min/max keep the magnitude that caused it visible.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 1e15))
      .toDF("event_type", "value")
    val got = Enrich.numericProfile(df, "event_type", "value").collect()(0)
    assert(got.getLong(1) == 4L && got.getLong(2) == 1L,
      s"overflow row must count as null: $got")
    assert(got.getDouble(3) == 1.0 && got.getDouble(4) == 1e15,
      "min/max must keep the raw double so the overflowing magnitude shows")
    assert(got.getDouble(5) == 2.0, "mean over the 3 in-range values")
    assert(got.getDouble(6) == 1.0, "stddev over the 3 in-range values")
    assert(got.getDouble(7) == 2.0 && got.getDouble(8) == 2.8,
      "percentiles over the 3 in-range values")
  }

  test("activeUsers: hand-computed DAU/WAU incl. the 7-day boundary and gaps") {
    import graft.ops.Enrich
    val day = 86400000L
    def ts(d: Int) = new java.sql.Timestamp(d * day + 1000L)
    val events = Seq(
      (1L, ts(1)), (2L, ts(1)), (1L, ts(1)),   // day 1: u1 twice, u2
      (1L, ts(2)),                             // day 2: u1
      (3L, ts(9))                              // day 9: u3 (d2 is 7 days back — OUTSIDE)
    ).toDF("user_id", "ts")
    val got = Enrich.activeUsers(events, "ts", "user_id")
      .orderBy("day_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // WAU(d1)={u1,u2}; WAU(d2)=d(-4..2) window={u1,u2}; WAU(d9)=d3..9={u3}
    assert(got == Seq(
      (1 * day, 2L, 2L, 1.0), (2 * day, 1L, 2L, 0.5), (9 * day, 1L, 1L, 1.0)))
  }

  test("retentionCohorts: hand-computed grid; pre-cohort activity and anchorless users excluded") {
    import graft.ops.Enrich
    val day = 86400000L
    def ts(d: Int) = new java.sql.Timestamp(d * day + 3600_000L) // 01:00 UTC on day d
    val events = Seq(
      // u1: purchase day 1; active days 1, 2, 5 → offsets 0, 1, 4
      (1L, "purchase", ts(1)), (1L, "view", ts(2)), (1L, "click", ts(5)),
      // u2: purchase day 2; day-1 activity is PRE-cohort → only 0, 1
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "view", ts(3)),
      // u2 twice on day 3: distinct (user, day) counts once
      (2L, "click", ts(3)),
      // u3: never purchases → no cohort, absent entirely
      (3L, "view", ts(1)), (3L, "view", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Enrich.retentionCohorts(events, "ts", "user_id",
        col("event_type") === "purchase")
      .orderBy("cohort_ms", "offset_days").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1 * day, 0, 1L), (1 * day, 1, 1L), (1 * day, 4, 1L),
      (2 * day, 0, 1L), (2 * day, 1, 1L)))
    // scale contract: partial aggs + one user join, never a window or
    // a per-cohort pass
    val plan = Enrich.retentionCohorts(events, "ts", "user_id",
      col("event_type") === "purchase").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"retentionCohorts must not window:\n$plan")
    assert(plan.contains("partial"), s"expected partial aggregation:\n$plan")
  }
}
