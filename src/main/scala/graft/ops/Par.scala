package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Parallelism floor for map-heavy pipeline inputs. */
object Par {

  /** Floor an input's partition count at the session default before a
    * map-heavy stage (per-doc hashing/shingling, probes×corpus
    * scoring). A small parquet file is one row group, and a row group
    * is one scan split no matter what `files.minPartitionNum` asks
    * for — so without this every pre-shuffle stage over such a file
    * runs as ONE task (measured at sf1: s7's 4M-pair scoring spent
    * 47 s on one core of 32; the arithmetic was never the cost). The
    * repartition fires only when the input arrives UNDER-parallel,
    * which by construction means it is tiny — an input big enough to
    * matter at 100 TB already scans as thousands of splits and passes
    * through untouched, so this never shuffles real data to fix a
    * local-file artifact.
    *
    * The partition probe is gated on the plan SHAPE: only a narrow
    * chain over leaf scans (project/filter/limit — the one shape that
    * can inherit a single-row-group split count) is probed, via
    * `queryExecution.toRdd` (skips Dataset.rdd's row-deserializer
    * wrap). A plan that already passed through an exchange
    * (aggregate/join/sort/repartition) is partitioned at the
    * session's shuffle parallelism, so probing it would re-plan the
    * whole upstream subtree — per widened input, per composed
    * pipeline stage — just to learn a number the config already
    * fixes; those plans pass through without any planning work.
    */
  def widen(df: DataFrame): DataFrame = {
    // Union and Deduplicate also inherit their children's partitioning
    // without an exchange, so a union-of-small-scans (or a
    // dropDuplicates whose physical agg AQE collapses to the scan's
    // split count) can arrive just as under-parallel as a bare scan;
    // Union recurses over ALL children.
    def narrowChain(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case u: Union => u.children.forall(narrowChain)
      case _: Project | _: Filter | _: LocalLimit | _: GlobalLimit |
           _: SubqueryAlias | _: Deduplicate =>
        narrowChain(p.children.head)
      case _ => false
    }
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (!narrowChain(df.queryExecution.analyzed)) df
    else if (df.queryExecution.toRdd.getNumPartitions < want)
      df.repartition(want)
    else df
  }
}
