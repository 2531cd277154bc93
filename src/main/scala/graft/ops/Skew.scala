package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deliberate skew handling for hot keys.
  *
  * AQE's skew-join/partition-coalescing is the first line of defense
  * (on by default); these helpers are for cases AQE can't fix at
  * runtime — a single group key holding a double-digit percentage of
  * the rows (aggregation), or a shuffle join where one key's rows
  * exceed an executor (join). Salt is derived by hashing caller-chosen
  * columns, so it is deterministic across retries and runs.
  */
object Skew {

  private def saltCol(saltBy: Seq[String], salts: Int): Column =
    pmod(xxhash64(saltBy.map(col): _*), lit(salts.toLong)).cast("int")

  /** Two-stage count for skewed keys: partial counts on (key, salt)
    * spread one hot key over `salts` reducers, then a cheap merge on
    * the key. Identical result to a direct groupBy(key).count.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBy: Seq[String],
                  salts: Int = 16): DataFrame =
    df.withColumn("_salt", saltCol(saltBy, salts))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("cnt"))

  /** Skew-safe equi-join: the (smaller, but not broadcastable) right
    * side is replicated `salts` times; the left side is salted
    * deterministically. One hot key's rows land on `salts` different
    * reducers instead of one. Result equals `left.join(right, keys)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBy: Seq[String], salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltCol(saltBy, salts))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "_salt").drop("_salt")
  }
}
