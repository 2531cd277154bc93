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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * outright; read it as a nanos long and surface a microsecond
    * TimestampType column (floor, matching DuckDB's ns→µs cast).
    * The nanosAsLong conf must be set at session build (see
    * [[graft.GraftSession]]) — a loader must not mutate session state.
    */
  def events: DataFrame = {
    require(spark.conf.getOption(graft.GraftSession.NanosConf).contains("true"),
      s"events.parquet carries TIMESTAMP(NANOS); build the session with " +
        s"${graft.GraftSession.NanosConf}=true (see graft.GraftSession.builder)")
    // integer `div`, not `/`: ns epochs (~1.7e18) overflow double mantissa
    load("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
