package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC source/sink — the Spark re-expression of the reference's
  * storage layer (a PostgreSQL connection + typed schema, reference
  * `src/db/connection.py:1-20`, `src/db/schema.py`).
  *
  * Scale posture: a single-connection JDBC read is one task no matter
  * the cluster size, so the partitioned read (predicate-split on a
  * numeric column) is the default entry point for anything bigger
  * than a dim table; writers control per-connection batching via
  * `batchsize` and fan out one connection per partition (repartition
  * upstream to size the connection count the database can take).
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Single-split read — dim tables and key scans only. `table` may be
    * a table name or a `(SELECT ...) alias` pushdown subquery.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Partition-parallel read: `numPartitions` concurrent range scans
    * on `[lowerBound, upperBound)` of a numeric/date `partitionColumn`
    * (a key or monotonic id). The only JDBC read shape that scales to
    * a large fact table — each executor pulls its own slice.
    */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionColumn: String, lowerBound: Long,
                          upperBound: Long, numPartitions: Int,
                          options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(options))

  /** Plain write; one JDBC connection per partition of `df`. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                options: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).jdbc(url, table, props(options))

  /** Idempotent keyed append — the reference's
    * `INSERT .. ON CONFLICT (key) DO NOTHING` (reference
    * `src/db/incidents.py:41-46`) for engines without upsert DDL:
    *  1. collapse the incoming batch to one row per key
    *     (keep-first by `orderBy`, exactly `Enrich.dedupKeepFirst`);
    *  2. anti-join the target's existing keys (a key-column-only
    *     scan, pushed down as a subquery);
    *  3. append only the missing rows.
    * Re-running the same batch is a no-op. Concurrent writers are the
    * caller's contract, as they are for the reference (single-writer
    * batch ETL).
    */
  def appendKeyedIdempotent(df: DataFrame, url: String, table: String,
                            keys: Seq[String], orderBy: Seq[String],
                            options: Map[String, String] = Map.empty): Unit = {
    val batch = graft.ops.Enrich.dedupKeepFirst(df, keys, orderBy)
    // key-column-only scan: Spark's JDBC source pushes the projection
    // into the generated SELECT (dialect-quoted — a hand-built
    // subquery would hit identifier-case rules engine by engine)
    val existingKeys = readJdbc(df.sparkSession, url, table, options)
      .select(keys.map(col): _*)
    val missing = batch.join(existingKeys, keys, "left_anti")
    // column order must match the target table, not the dedup output
    writeJdbc(missing.select(df.columns.map(col).toIndexedSeq: _*), url, table,
      SaveMode.Append, options)
  }
}
