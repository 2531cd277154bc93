package graft.ops

import org.apache.spark.sql.DataFrame

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
    */
  def widen(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
