package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.geo

/** Reference-derived enrichment operators, re-expressed as declarative
  * DataFrame transforms so Catalyst handles pushdown/pruning and every
  * step is shuffle-minimal at scale.
  */
object Enrich {

  /** Time derivations (reference `src/pdf/parse_incidents.py:9-21`,
    * `src/db/incidents.py:20-27`): day_of_week recoded to 1=Sunday..
    * 7=Saturday (Spark's dayofweek already uses that convention),
    * hour-of-day, plus a 0/1 flag column from a marker value.
    */
  def deriveTime(df: DataFrame, ts: Column, flagCol: Column, marker: String): DataFrame =
    df.withColumn("day_of_week", dayofweek(ts))
      .withColumn("time_of_day", hour(ts))
      .withColumn("flag", when(flagCol === marker, 1).otherwise(0))

  /** Frequency rank of `key` (reference `src/db/incidents.py:66-73`):
    * RANK() OVER (ORDER BY COUNT(*) DESC). The global window is safe
    * ONLY for dictionary-cardinality keys (locations, natures — the
    * reference's use): it sorts the GROUPED counts, so all |distinct
    * keys| rows move to ONE partition. Handing it a high-cardinality
    * key (user id, doc id) funnels the whole distinct-key set through
    * a single task — for that shape use [[frequencyRankTop]], which
    * bounds the windowed table at `topN` rows regardless of key
    * cardinality. The count itself is a partial-agg-friendly shuffle
    * either way.
    */
  def frequencyRank(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", rank().over(Window.orderBy(col("cnt").desc)))

  /** [[frequencyRank]] bounded at the `topN` most frequent keys — the
    * high-cardinality-safe form. The grouped counts pass through
    * TakeOrdered (per-partition top-N merged on the driver — no global
    * sort, no single-partition window over the full key set); the rank
    * window then runs over at most `topN` rows. Ranks of retained rows
    * equal their global ranks (rank counts strictly-greater rows, all
    * of which are retained); WHICH rows survive a tie straddling the
    * cutoff is unspecified, as with any top-N.
    */
  def frequencyRankTop(df: DataFrame, key: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
      .withColumn("rank", rank().over(Window.orderBy(col("cnt").desc)))
  }

  /** Attach the frequency rank back onto each row (the reference's
    * UPDATE ... FROM LocationFrequency). Rank table is tiny → broadcast.
    */
  def withFrequencyRank(df: DataFrame, key: String, rankName: String): DataFrame =
    df.join(broadcast(frequencyRank(df, key).withColumnRenamed("rank", rankName)
      .drop("cnt")), Seq(key))

  /** Keep-first keyed dedup — the Spark analog of
    * `INSERT ... ON CONFLICT (key) DO NOTHING` (reference
    * `src/db/incidents.py:41-46`): one shuffle on the key, min by the
    * deterministic (orderTs, orderId) arrival order via a struct-min
    * aggregate (no window sort needed).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(c => orderBy.contains(c) || keys.contains(c))
    val ordStruct = struct((orderBy ++ payload).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min(ordStruct).as("first"))
      .select(keys.map(col) ++ Seq(col("first.*")): _*)
  }

  /** Group-max flag propagation (reference `src/db/incidents.py:49-57`:
    * same (incident_ts, location) with any emsstat=1 → all 1). The
    * reference does a quadratic self-join; a grouped max over the key
    * is one shuffle and linear.
    */
  def propagateFlag(df: DataFrame, groupKeys: Seq[String], flag: String): DataFrame =
    df.withColumn(s"${flag}_propagated",
      max(col(flag)).over(Window.partitionBy(groupKeys.map(col): _*)))

  /** Incremental watermark filter (reference `src/scrape/normanpd.py:
    * 24-46`): only rows with ts after (max(ts) - lookback). The max is
    * a partial-agg scalar; the filter then prunes at the scan.
    */
  def incrementalAfterWatermark(df: DataFrame, ts: String, lookbackDays: Int): DataFrame = {
    val wm = df.agg(max(col(ts).cast("date")).as("maxd"))
      .select(date_sub(col("maxd"), lookbackDays).as("wm"))
    df.join(broadcast(wm), col(ts).cast("date") > col("wm")).drop("wm")
  }

  /** Cache-miss dimension upsert — the reference's incremental geocode
    * cache (`src/db/location.py:36-72`): distinct keys seen in the
    * facts → anti-join the existing dim → enrich ONLY the missing keys
    * (the expensive fetch runs once per novel key, never per fact row
    * and never for already-cached keys) → union onto the dim.
    *
    * `enrichMissing` turns a DataFrame of distinct missing keys into
    * full dim rows (same schema as `dim`); existing dim rows pass
    * through untouched. Scale shape: distinct is one partial-agg
    * shuffle on the keys; the anti-join broadcasts whichever side is
    * small (dims usually are — AQE decides from runtime stats).
    */
  def upsertDim(dim: DataFrame, facts: DataFrame, keys: Seq[String],
                enrichMissing: DataFrame => DataFrame): DataFrame = {
    val missingKeys = facts.select(keys.map(col): _*).na.drop(keys).distinct()
      .join(dim, keys, "left_anti")
    dim.unionByName(enrichMissing(missingKeys))
  }

  /** Enrichment-health metrics (reference `src/pipeline/main.py` step
    * 11): count of NULL/blank values per enriched column, one row out.
    */
  def nullHealth(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    } :+ count(lit(1)).as("total_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** side_of_town enrichment (reference `src/enrich/geography.py`):
    * compass direction of (lat,lon) relative to the town center.
    */
  def withSideOfTown(df: DataFrame, lat: Column, lon: Column): DataFrame =
    df.withColumn("side_of_town", geo.sideOfTown(lat, lon))

  /** Slowly-changing-dimension (type 2) history build from a change
    * log: collapse consecutive same-value observations per key into
    * versioned effective intervals `[valid_from, valid_to)` — the
    * upsert-history twin of [[upsertDim]] (which keeps only the latest
    * value). `valid_to` is NULL on each key's current version.
    *
    * Ordering inside a key is (orderCol, tieCols...) — pass tie
    * columns that make the sort total (e.g. an event id), or
    * duplicate-ts rows would make version assignment
    * partition-order-dependent. Rows that repeat the previous value
    * open NO new version (the ON CONFLICT DO NOTHING of histories).
    *
    * Scale shape: windows partitioned by the dimension KEY only —
    * high cardinality, no global window; state per partition is one
    * lag row. One shuffle on the key serves change-detection, the
    * version cumsum, interval collapse, and the valid_to lead.
    */
  def scd2History(log: DataFrame, keys: Seq[String], valueCol: String,
                  orderCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val rowOrder = (col(orderCol) +: tieCols.map(col)) :+ col(valueCol)
    val wOrd = byKey.orderBy(rowOrder.map(_.asc): _*)
    // row_number (not lag-is-null) opens the first version, so a NULL
    // first value still starts at version 1; <=> keeps NULL-to-value
    // transitions well-defined
    val changed = when(row_number().over(wOrd) === 1 ||
      !(lag(col(valueCol), 1).over(wOrd) <=> col(valueCol)), 1L).otherwise(0L)
    val versioned = log
      .withColumn("version", sum(changed).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wVer = byKey.orderBy(col("version").asc)
    versioned
      .groupBy((keys :+ "version").map(col): _*)
      .agg(min(col(valueCol)).as(valueCol),   // constant within a version
        min(col(orderCol)).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
  }

  /** Point-in-time (temporal lookup) join: attach to each fact row the
    * dimension version in effect at the fact's timestamp — the
    * consumer of [[scd2History]]'s output ("what was the entity's
    * state when this event happened"), and the lookup that makes a
    * type-2 history useful. A fact matches the unique interval with
    * `valid_from <= ts` and (`valid_to` NULL or `ts < valid_to`);
    * facts before a key's first version (or with an unknown key) keep
    * NULL enrichment via the left join.
    *
    * Scale shape: an EQUI-join on the dimension keys with the
    * interval predicate as a RESIDUAL condition — never a range/theta
    * join (q25's binning exists for the no-equi-key case; here the
    * key carries the join). Versions of one key are consecutive
    * half-open intervals, so each fact matches at most ONE history
    * row and output cardinality = fact cardinality; empty intervals
    * (two changes at one timestamp) match nothing by the strict
    * upper bound. The shuffle keys on the high-cardinality dim key;
    * a dim-sized history broadcasts under AQE like any dim table.
    *
    * History columns are prefixed internally so a history derived
    * from the fact table itself (self-lineage) joins without
    * ambiguous-attribute resolution.
    */
  def pitJoin(facts: DataFrame, history: DataFrame, keys: Seq[String],
              tsCol: String): DataFrame = {
    require(history.columns.contains("valid_from") &&
      history.columns.contains("valid_to"),
      "history must carry valid_from/valid_to (the scd2History contract)")
    val pre = "graft_h_"
    val h = history.select(history.columns.map(c => col(c).as(pre + c)): _*)
    val cond = keys.map(k => col(k) <=> col(pre + k)).reduce(_ && _) &&
      col(tsCol) >= col(pre + "valid_from") &&
      (col(pre + "valid_to").isNull || col(tsCol) < col(pre + "valid_to"))
    val enriched = history.columns
      .filterNot(c => keys.contains(c) || c == "valid_to")
    facts.join(h, cond, "left")
      .select(facts.columns.map(col) ++
        enriched.map(c => col(pre + c).as(c)): _*)
  }

  /** Rolling z-score anomaly detection over per-minute event rates —
    * the pipeline-health monitor ("did the crawler/source spike or
    * die?") every ingestion pipeline runs beside its real queries.
    * Each (group, minute) rate is scored against the TRAILING
    * `windowRows` observed minutes (current row excluded, so a spike
    * can't mask itself); |z| >= `zThreshold` flags the row. Minutes
    * with fewer than `minPoints` trailing observations score NULL
    * (cold start), as do zero-variance windows.
    *
    * Engine-portable determinism: the window aggregates are INTEGER
    * sums (n, Σcnt, Σcnt²) — exact under any partitioning — and
    * mean/variance/z are derived in ONE double expression from those
    * exact integers, so there is no FP accumulation order anywhere;
    * z floor-rounds at 4dp and the flag tests the ROUNDED value.
    *
    * Scale shape: the corpus-sized work is the minute rollup (one
    * partial-agg shuffle); the window runs over the ROLLUP (rows =
    * active minutes × groups — time-bounded, not corpus-bounded),
    * partitioned by group. Sparse series: the trailing frame spans
    * the last `windowRows` ACTIVE minutes (empty minutes emit no
    * rollup row); densify upstream if gaps must count as zero.
    */
  def rateAnomaly(df: DataFrame, tsCol: String, groupCol: String,
                  windowRows: Int = 20, minPoints: Int = 5,
                  zThreshold: Double = 3.0): DataFrame = {
    require(windowRows >= 2 && minPoints >= 2,
      s"windowRows/minPoints must each be >= 2, got $windowRows/$minPoints")
    val rollup = df
      .groupBy(col(groupCol).as("grp"),
        unix_millis(date_trunc("minute", col(tsCol))).as("minute_ms"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy("minute_ms")
      .rowsBetween(-windowRows, -1)
    val scored = rollup
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
    // variance written EXACTLY as the oracle writes it: one expression
    // tree over exact integers, no intermediate accumulation
    val varExpr = (col("s2").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n").cast("double")) /
      (col("n") - 1).cast("double")
    val zExpr = graft.functions.num.fround(
      (col("cnt").cast("double") - col("s").cast("double") / col("n").cast("double")) /
        sqrt(varExpr), 4)
    scored
      .withColumn("z", when(col("n") >= minPoints && varExpr > 0.0, zExpr))
      .withColumn("anomaly",
        when(col("z").isNotNull && abs(col("z")) >= zThreshold, 1L).otherwise(0L))
      .select("grp", "minute_ms", "cnt", "z", "anomaly")
  }

  /** Typed extraction from a semi-structured JSON string column +
    * grouped numeric profile — the "parse the event payload" step
    * every telemetry pipeline runs before real analytics (the
    * reference stores its per-incident attributes as opaque columns;
    * a JSON props blob is the streaming-era equivalent).
    *
    * `from_json` with an explicit DDL schema is the typed, codegen'd
    * path (a malformed blob yields NULL fields, counted as
    * n_events − n_parsed — never a thrown task); extraction is
    * MAP-ONLY and the profile is one partial-agg shuffle on the
    * group key. All stats are integral-exact; the mean divides two
    * exact integrals and floor-rounds at 4dp (engine-portable).
    */
  def jsonFieldProfile(df: DataFrame, jsonCol: String, fieldDdl: String,
                       fieldName: String, groupCol: String): DataFrame = {
    val parsed = df.select(col(groupCol).as("grp"),
      from_json(col(jsonCol),
          org.apache.spark.sql.types.StructType.fromDDL(fieldDdl))
        .getField(fieldName).as("v"))
    parsed.groupBy("grp")
      .agg(count(lit(1)).as("n_events"), count(col("v")).as("n_parsed"),
        min("v").as("v_min"), max("v").as("v_max"),
        sum("v").as("v_sum"),
        graft.functions.num.fround(
          sum("v").cast("double") / count(col("v")), 4).as("v_avg"))
  }

  /** CDC changelog collapse: reduce an (upsert | delete) change
    * stream to final table state — the general form of the
    * reference's keyed idempotent insert ([[scd2History]]'s sibling:
    * SCD-2 keeps every version as an interval; this keeps only the
    * LIVE row, honoring deletes). Per key, the surviving row is the
    * one with the greatest `seqCols` tuple — unless that last change
    * is a delete, in which case the key vanishes from the output.
    *
    * Scale shape: ONE partial-agg shuffle — the whole collapse is
    * `max(struct(seq..., del, payload...))` per key, so map tasks
    * pre-reduce each key to a single candidate row before the
    * exchange (a hot key's million updates cross the wire as one
    * struct per map partition, where the window row_number form
    * shuffles and sorts every change). `seqCols` must be a total
    * order per key (e.g. ts + a unique change id): struct comparison
    * is lexicographic by field position, so the trailing del/payload
    * fields never influence which change wins.
    */
  def cdcApply(log: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
               deleteCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty,
      "cdcApply needs at least one key and one sequence column")
    val fields = seqCols.map(col) ++ (col(deleteCol) +: payloadCols.map(col))
    log.groupBy(keyCols.map(col): _*)
      .agg(max(struct(fields: _*)).as("graft_last"))
      .filter(!col(s"graft_last.$deleteCol"))
      .select(keyCols.map(col) ++
        seqCols.map(c => col(s"graft_last.$c").as(c)) ++
        payloadCols.map(c => col(s"graft_last.$c").as(c)): _*)
  }

  /** Hourly rollup in MERGEABLE-STATE form: (keys..., hour, n, sum as
    * exact decimal) — no derived ratios, so two rollups over disjoint
    * slices merge into the rollup of their union by plain addition.
    * The persisted-aggregate shape incremental maintenance needs.
    */
  def hourlyRollupState(events: DataFrame, tsCol: String, typeCol: String,
                        valCol: String): DataFrame =
    events.groupBy(col(typeCol).as("event_type"),
        unix_millis(date_trunc("hour", col(tsCol))).as("hb_ms"))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(18,6)")).as("sum_value"))

  /** INCREMENTAL ROLLUP MAINTENANCE: merge a new slice's rollup state
    * into the accumulated state and derive the serving columns — the
    * "today's partition updates the dashboard without rescanning
    * history" operator, the single most important cost shape at
    * 100 TB (the full-recompute alternative rereads the corpus per
    * batch; this reads ONLY the delta plus the bounded state table).
    *
    * Correct because the state is MERGEABLE: counts and exact-decimal
    * sums are associative/commutative, so `merge(rollup(A),
    * rollup(B)) == rollup(A ∪ B)` bit-for-bit — which is exactly what
    * the oracle asserts (the query merges two disjoint slices and is
    * compared against DuckDB's single-pass rollup of everything).
    * Derived ratios (avg) compute AT SERVE TIME from the merged
    * state, never stored — storing them would break mergeability.
    * Shape: union + ONE partial-agg shuffle on the bounded
    * (type, hour) grid.
    */
  def mergeRollups(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeRollups needs at least one state")
    states.reduce(_ unionAll _)
      .groupBy("event_type", "hb_ms")
      .agg(sum(col("n")).as("n"), sum(col("sum_value")).as("sv"))
      .select(col("event_type"), col("hb_ms"), col("n"),
        // q11's serve-time derivations, from the MERGED exact state
        round(col("sv").cast("double"), 2).as("sum_value"),
        graft.functions.num.fround(
          col("sv").cast("double") / col("n"), 4).as("avg_value"))
  }

  /** Grouped NUMERIC PROFILE — the `describe()` of a measure column
    * as one scale-safe query: per group n, null count, min/max, and
    * engine-exact mean / sample-stddev / p50 / p90. The data-quality
    * panel every ingest pipeline runs on its numeric columns (a
    * broken upstream shows up as a null spike, a shifted mean, or a
    * collapsed p90 long before anything downstream fails).
    *
    * Engine-portable FP on arbitrary doubles: values 4dp-floor-round
    * FIRST, then sums accumulate in exact DECIMAL (t18's recipe —
    * 4dp values sum exactly in (28,4), their squares exactly in
    * (38,8)), so mean and the one-expression sample stddev
    * sqrt((s2 − s²/n)/(n−1)) see identical inputs in every engine;
    * quantiles interpolate over the SAME rounded values (t10's
    * percentile ↔ quantile_cont parity). min/max compare raw doubles
    * (exact). Stddev is NULL for n < 2; all derived stats are NULL
    * for all-null groups. ONE partial-agg shuffle; the percentile
    * state is the only per-group buffer (swap approx_percentile when
    * a single group's values exceed executor memory — t10's trade).
    */
  def numericProfile(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import graft.functions.num.fround
    val v = col(valCol).cast("double")
    // squares use (18,4): (18,4)×(18,4) = decimal(37,8) — EXACT.
    // Squaring dv at (28,4) would ask for (57,8), which Spark's
    // allowPrecisionLoss rule silently truncates to (38,6) — each
    // square HALF_UP-rounded to 6dp before summing, diverging from
    // an exact-scale-8 oracle on any value with nonzero 3rd/4th
    // fractional digits. 14 integer digits is ample for profiled
    // measures. A value overflowing (18,4) (|v| >= 1e14) must not
    // kill the job (ANSI cast throws) and must not silently skew the
    // stats (non-ANSI cast nulls — pre-fix the row dropped from s2
    // but NOT from s/n_v, corrupting v_std): this is the data-QUALITY
    // panel, so a broken value is a FINDING, not a crash. try_cast
    // nulls the overflow in both ANSI modes; the row is then nulled
    // out of EVERY derived stat consistently (it lands in n_null, the
    // panel's loud column) while min/max keep the raw double so the
    // magnitude that caused it stays visible.
    val staged = df.select(col(groupCol).as("grp"), v.as("v0"),
      fround(v, 4).as("r0"))
      .withColumn("dv18", col("r0").try_cast("decimal(18,4)"))
      .withColumn("overflow", col("r0").isNotNull && col("dv18").isNull)
      .withColumn("v", when(col("overflow"), lit(null)).otherwise(col("v0")))
      .withColumn("r", when(col("overflow"), lit(null)).otherwise(col("r0")))
      .withColumn("dv", col("r").cast("decimal(28,4)"))
    val nv = count(col("v"))
    val s = sum(col("dv")).cast("double")
    val s2 = sum((col("dv18") * col("dv18")).cast("decimal(38,8)")).cast("double")
    staged.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - nv).as("n_null"),
        min("v0").as("v_min"), max("v0").as("v_max"),
        fround(s / nv.cast("double"), 6).as("v_mean"),
        when(nv >= 2, fround(sqrt(
          (s2 - s * s / nv.cast("double")) / (nv - 1).cast("double")), 6))
          .as("v_std"),
        fround(percentile(col("r"), lit(0.5)), 6).as("p50"),
        fround(percentile(col("r"), lit(0.9)), 6).as("p90"))
  }

  /** Equi-width HISTOGRAM per group: `bins` equal-width buckets over
    * the group's own [min, max] — the binned-distribution view q35's
    * moments can't show (bimodality, heaping, truncation). Two
    * passes, both bounded: a per-group min/max partial agg broadcast
    * back (|groups| rows), then a map-side bin index + one partial
    * agg on the bounded (group, bin) grid. Empty bins are kept as 0
    * (a gap IS the finding) via a groups×bins frame from the bounded
    * stats table. Engine-exact binning: the bin index is
    * floor((v−min)/w) on 4dp-rounded values with w = (max−min)/bins
    * computed once — identical IEEE ops everywhere — clamped so
    * v = max lands in the last bin; a zero-width group (all values
    * equal) puts everything in bin 0.
    */
  def histogram(df: DataFrame, groupCol: String, valCol: String,
                bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    import graft.functions.num.fround
    val staged = df.select(col(groupCol).as("grp"),
        fround(col(valCol).cast("double"), 4).as("r"))
      .where(col("r").isNotNull)
    val stats = staged.groupBy("grp")
      .agg(min(col("r")).as("vmin"), max(col("r")).as("vmax"))
    val w = (col("vmax") - col("vmin")) / lit(bins.toDouble)
    val bin = when(col("vmax") === col("vmin"), lit(0))
      .otherwise(least(floor((col("r") - col("vmin")) / w).cast("int"),
        lit(bins - 1)))
    val counts = staged.join(broadcast(stats), "grp")
      .groupBy(col("grp"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val frame = stats.select(col("grp"), col("vmin"), col("vmax"),
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    frame.join(counts, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"),
        fround(col("vmin") + col("bin").cast("double") *
          ((col("vmax") - col("vmin")) / lit(bins.toDouble)), 6).as("bin_lo"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** DAU / WAU active-user counts with stickiness (DAU/WAU) per day —
    * the engagement panel, and the distinct-count-over-sliding-window
    * problem done WITHOUT window distinct-count state: a user active
    * on day d contributes to the 7 window-end days d..d+6, so WAU
    * falls out of a bounded explode (×7) + dedup + partial-agg count.
    * The event stream first collapses to distinct (user, day) — at
    * most users × days rows — so the explode never touches raw
    * events. No windows, no per-day rescans, no approximate sketch
    * needed (though t19's HLL swap-in applies if users × days
    * itself is the bottleneck). Rows = days with ≥ 1 active user
    * (a silent day has no DAU row by definition). Day math is
    * integer millis on UTC-truncated stamps.
    */
  def activeUsers(events: DataFrame, tsCol: String, userCol: String): DataFrame = {
    val ud = events
      .select(col(userCol).as("uid"),
        unix_millis(date_trunc("day", col(tsCol))).as("d"))
      .distinct()
    val dau = ud.groupBy(col("d").as("day_ms"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("uid"),
        explode(sequence(lit(0), lit(6))).as("o"),
        col("d"))
      .select(col("uid"), (col("d") + col("o").cast("long") * lit(86400000L)).as("w"))
      .distinct()
      .groupBy(col("w").as("day_ms"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, "day_ms")
      .select(col("day_ms"), col("dau"), col("wau"),
        graft.functions.num.fround(
          col("dau").cast("double") / col("wau").cast("double"), 4)
          .as("stickiness"))
  }

  /** COHORT RETENTION matrix: users grouped by the day of their first
    * `anchor` event (the cohort), counted on each subsequent day any
    * activity occurred — the (cohort day, day offset) → active-users
    * grid every product/ops dashboard draws, and the
    * pipeline-freshness analog ("of sources first seen on day D, how
    * many still deliver at D+k"). Rows: (cohort_ms, offset_days,
    * n_users); a user contributes at offset k iff they had ANY event
    * exactly k days after their cohort day (offset 0 always exists:
    * the anchor event itself is activity). Users who never fire the
    * anchor are absent — they have no cohort.
    *
    * Scale shape — this is the "don't rescan history per cell" form:
    * 1. cohort anchor = one partial-agg shuffle keyed user
    *    (`min(day)` over the anchor-filtered scan);
    * 2. activity dedups to distinct (user, day) — a second partial
    *    agg, collapsing the event stream to at most users × days rows
    *    BEFORE any join;
    * 3. both sides are then keyed by user, so the join co-partitions
    *    (one exchange each, no re-shuffle), and the final (cohort,
    *    offset) count is a partial agg on a BOUNDED key grid
    *    (days × days). No windows, no distinct-count state, no
    *    per-cohort scans.
    * Day arithmetic is integer millis on UTC day-truncated stamps, so
    * offsets are engine-exact.
    */
  def retentionCohorts(events: DataFrame, tsCol: String, userCol: String,
                       anchorFilter: Column): DataFrame = {
    val dayMs = (c: Column) => unix_millis(date_trunc("day", c))
    val firsts = events.filter(anchorFilter)
      .groupBy(col(userCol).as("uid"))
      .agg(min(dayMs(col(tsCol))).as("cohort_ms"))
    val activity = events
      .select(col(userCol).as("uid"), dayMs(col(tsCol)).as("day_ms"))
      .distinct()
    activity.join(firsts, "uid")
      .filter(col("day_ms") >= col("cohort_ms"))
      .groupBy(col("cohort_ms"),
        ((col("day_ms") - col("cohort_ms")) / lit(86400000L))
          .cast("int").as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }
}
