package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Enrich
import graft.sources.Sources
import graft.tables.Tables

/** End-to-end replica of the reference pipeline's flow
  * (reference `src/pipeline/main.py`): ingest → idempotent keyed
  * insert → time derivations + flag → frequency ranks → group flag
  * propagation → geo enrichment → health metrics → CSV export.
  * One run of this spec is the "switch from the reference" story:
  * every stage is a graft operator.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkHarness._

  test("full reference-shaped pipeline runs end-to-end and exports CSV") {
    val raw = Tables(spark, sfDir).events

    // 1. idempotent keyed insert (ON CONFLICT DO NOTHING)
    val deduped = Enrich.dedupKeepFirst(
      raw.withColumn("ts_ms", unix_millis(col("ts"))),
      keys = Seq("event_id"), orderBy = Seq("ts_ms"))
    assert(deduped.count() == raw.select("event_id").distinct().count())

    // 2. time derivations + marker flag
    val derived = Enrich.deriveTime(deduped, col("ts"), col("event_type"), "error")

    // 3. frequency rank joined back per row (location_rank analog)
    val ranked = Enrich.withFrequencyRank(derived, "event_type", "type_rank")

    // 4. group flag propagation (EMSSTAT analog)
    val flagged = Enrich.propagateFlag(
      ranked.withColumn("mb", date_trunc("minute", col("ts"))),
      Seq("mb", "user_id"), "flag")

    // 5. geo enrichment (side_of_town) on synthesized coordinates
    val located = Enrich.withSideOfTown(
      flagged
        .withColumn("lat", lit(35.22) + (col("user_id") % 10).cast("double") * 0.01)
        .withColumn("lon", lit(-97.44) + (col("user_id") % 7).cast("double") * 0.01),
      col("lat"), col("lon"))

    // 6. enrichment health
    val health = Enrich.nullHealth(located, Seq("side_of_town", "type_rank"))
      .collect().head
    assert(health.getAs[Long]("null_side_of_town") == 0L)
    assert(health.getAs[Long]("null_type_rank") == 0L)

    // 7. export with headers (the reference's CSV dump) and re-read
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val exported = located.select("event_id", "day_of_week", "time_of_day",
      "flag", "flag_propagated", "type_rank", "side_of_town")
    Sources.writeCsv(exported, out)
    val back = Sources.readCsv(spark, out, exported.schema)
    assert(back.count() == exported.count())
    assert(back.columns.toSeq == exported.columns.toSeq)
  }
}
