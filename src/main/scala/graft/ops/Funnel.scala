package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — "of the users who
  * did A, how many then did B, then C?" (reference analog: the
  * incident-pipeline's per-entity event rollups generalized to the
  * sequential-conversion question every product-analytics stack asks
  * of its event table).
  */
object Funnel {

  /** Per-entity strictly-ordered stage timestamps. Stage k's timestamp
    * is the EARLIEST stage-k event STRICTLY AFTER stage k−1's
    * timestamp (min-chaining — the standard funnel semantics: a
    * purchase logged before the user's first view does not convert,
    * and each stage can only match events after the previous stage
    * resolved). An entity that never reaches stage k has NULL from
    * that stage on; every entity in the input gets a row.
    *
    * Scale shape: ONE shuffle. The chained stage minimums are
    * consecutive whole-partition Window ops over the same
    * `partitionBy(entity)` — Spark plans one exchange reused by every
    * Window AND by the final per-entity collapse (same hash
    * partitioning), so an n-stage funnel costs the same single
    * shuffle as a plain groupBy — never a per-stage self-join of the
    * event table (the naive SQL form, which shuffles events once per
    * stage). Ties: pass an already-truncated numeric/millis ts column
    * for engine-portable strictness semantics; "same timestamp" never
    * advances a stage.
    */
  def stages(events: DataFrame, entityCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    val w = Window.partitionBy(entityCol)
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === lit(step)
        else col(typeCol) === lit(step) && col(s"graft_t$i").isNotNull &&
          col(tsCol) > col(s"graft_t$i")
      df.withColumn(s"graft_t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    withTs.groupBy(col(entityCol))
      .agg(min(col("graft_t1")).as(s"ts_${steps.head}"),
        steps.indices.tail.map(i =>
          min(col(s"graft_t${i + 1}")).as(s"ts_${steps(i)}")): _*)
  }

  /** Funnel summary: one row per stage with the entity count that
    * reached it and the conversion rate from the previous stage
    * (4dp floor-round; stage 1's rate is vs the total entity count).
    */
  def summary(stageRows: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val counts = stageRows.agg(
      count(lit(1)).as("n_total"),
      steps.map(s => count(col(s"ts_$s")).as(s"n_$s")): _*)
    val perStage = steps.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) col("n_total") else col(s"n_${steps(i - 1)}")
      struct(lit(i + 1).as("stage"), lit(s).as("step"),
        col(s"n_$s").as("n_reached"),
        when(prev === 0L, lit(null).cast("double"))
          .otherwise(graft.functions.num.fround(
            col(s"n_$s").cast("double") / prev.cast("double"), 4)).as("conv_rate"))
    }
    counts.select(explode(array(perStage: _*)).as("r"))
      .select(col("r.stage"), col("r.step"), col("r.n_reached"), col("r.conv_rate"))
  }
}
