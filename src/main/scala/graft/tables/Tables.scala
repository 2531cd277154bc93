package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema'd loaders for the test star schema + events/documents/embeddings.
  *
  * The reference's "source of truth" is a PostgreSQL `incidents` table
  * (reference `src/db/schema.py`); here the source of truth is columnar
  * parquet so scans get predicate pushdown + column pruning for free.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark 4 rejects unless read as a nanos long via the nanosAsLong
    * conf set at session build (see [[graft.GraftSession]]) — and
    * plain TIMESTAMP(MICROS). Branch on the LOADED dtype so both
    * generations surface the same microsecond TimestampType column
    * (ns floors to µs, matching DuckDB's ns→µs cast; NTZ micros are
    * UTC wall-clock under the session's pinned UTC zone).
    */
  def events: DataFrame = {
    val raw = load("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: ns epochs (~1.7e18) overflow double mantissa
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
