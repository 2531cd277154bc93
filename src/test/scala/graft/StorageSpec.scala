package graft

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Enrich, Multimodal}
import graft.sources.Jdbc
import graft.tables.Tables

/** The reference's storage-layer behaviors: JDBC round trip with the
  * idempotent keyed append (`INSERT .. ON CONFLICT DO NOTHING`), the
  * cache-miss dim upsert, and structured bytes→rows extraction.
  * Derby runs embedded (in /opt/spark/jars), standing in for the
  * reference's PostgreSQL.
  */
class StorageSpec extends AnyFunSuite {
  import SparkHarness._

  private val url = "jdbc:derby:memory:grafttest;create=true"

  test("jdbc write/read round trip and partitioned read") {
    val src = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
    Jdbc.writeJdbc(src, url, "events_rt", SaveMode.Overwrite)
    val back = Jdbc.readJdbc(spark, url, "events_rt")
    assert(back.count() == src.count())
    assert(back.orderBy("event_id").collect().toSeq ==
      src.orderBy("event_id").collect().toSeq)
    val maxId = src.agg(max("event_id")).head().getLong(0)
    val part = Jdbc.readJdbcPartitioned(spark, url, "events_rt",
      "event_id", 0L, maxId + 1, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == src.count())
  }

  test("appendKeyedIdempotent: re-running a batch adds nothing; only new keys land") {
    val base = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val half = base.filter(col("event_id") % 2 === 0)
    Jdbc.writeJdbc(half, url, "events_idem", SaveMode.Overwrite)
    val n0 = Jdbc.readJdbc(spark, url, "events_idem").count()
    // same batch again, duplicated within itself too -> no-op
    Jdbc.appendKeyedIdempotent(half.union(half), url, "events_idem",
      keys = Seq("event_id"), orderBy = Seq("ts_ms"))
    assert(Jdbc.readJdbc(spark, url, "events_idem").count() == n0)
    // full batch -> only the missing (odd) keys are appended
    Jdbc.appendKeyedIdempotent(base, url, "events_idem",
      keys = Seq("event_id"), orderBy = Seq("ts_ms"))
    val after = Jdbc.readJdbc(spark, url, "events_idem")
    assert(after.count() == base.dropDuplicates("event_id").count())
    assert(after.select("event_id").distinct().count() == after.count())
  }

  test("upsertDim leaves existing rows untouched and adds only missing keys") {
    val t = Tables(spark, sfDir)
    val dim = t.nation.filter(col("n_nationkey") < 13)
      .select(col("n_nationkey").as("nationkey"), col("n_name").as("name"),
        lit("cached").as("src"))
    val result = Enrich.upsertDim(dim,
      t.customer.select(col("c_nationkey").as("nationkey")), Seq("nationkey"),
      m => m.select(col("nationkey"),
        concat(lit("backfilled_"), col("nationkey")).as("name"),
        lit("fetched").as("src")))
    val cached = result.filter(col("src") === "cached")
      .orderBy("nationkey").collect().toSeq
    assert(cached == dim.orderBy("nationkey").collect().toSeq,
      "existing dim rows must pass through byte-identical")
    val factKeys = t.customer.select(col("c_nationkey")).distinct()
      .collect().map(_.getAs[Number](0).longValue()).toSet
    val fetched = result.filter(col("src") === "fetched")
      .select("nationkey").collect().map(_.getAs[Number](0).longValue()).toSet
    assert(fetched == (factKeys -- (0L until 13L)), "exactly the cache misses")
    // idempotent: upserting again over the result adds nothing
    val again = Enrich.upsertDim(result,
      t.customer.select(col("c_nationkey").as("nationkey")), Seq("nationkey"),
      m => m.select(col("nationkey"), lit("x").as("name"), lit("y").as("src")))
    assert(again.count() == result.count())
  }

  test("extractRecords: parser-defined bytes->rows with empty and multi-space payloads") {
    import spark.implicits._
    val docs = Seq((1L, "alpha  beta\tgamma"), (2L, ""), (3L, "  solo "))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val got = Multimodal.extractRecords(docs, "payload", "doc_id",
        Multimodal.WhitespaceRecordParser)
      .orderBy("doc_id", "rec_idx").collect().toSeq
    assert(got == Seq(
      Row(1L, 0L, "alpha", 5L), Row(1L, 1L, "beta", 4L), Row(1L, 2L, "gamma", 5L),
      Row(3L, 0L, "solo", 4L)))
  }
}
