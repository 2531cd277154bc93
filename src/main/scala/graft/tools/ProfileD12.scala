package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of d12_semdedup_prune — the board's
  * heaviest recorded query three rounds running (r07 verdict: 5.57 s
  * driver record vs its 4.2-5.0 documented local[32] band). Stages:
  * the d11 pair generation (k-means fit + assign + in-cluster pair
  * join), the transitive-cluster CC step, and the corpus-wide verdict
  * join — so a recorded full-op number decomposes into which stage
  * moved. Usage:
  *   sbt "runMain graft.tools.ProfileD12 [sfDir] [repeats] [k]"
  */
object ProfileD12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val k = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")

    def t(label: String)(f: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-12s " +
        runs.map(r => f"${r._1}%.3f").mkString(" ") + s"  rows=${runs.head._2}")
    }
    // NOTE: sweep is explicit between sections — GraftSession.sweep
    // drops ALL cached tables, so it must not run while a staged
    // persisted table is live

    def fullOp(): Long = {
      val pairs = graft.ops.Cluster.semDedupPairs(embs, "embedding", "vec_id",
        k = k, threshold = 0.4, iters = 1)
      val verdict = graft.ops.Graph.clusterDedup(pairs, "id1", "id2")
      embs.select(col("vec_id"))
        .join(verdict, col("vec_id") === col("id"), "left_outer")
        .select(col("vec_id").as("id"),
          coalesce(col("component"), col("vec_id")).as("component"),
          coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
          coalesce(col("keep"), lit(1)).as("keep"))
        .count()
    }
    t("full") { fullOp() }
    graft.GraftSession.sweep(spark)

    // ---- decomposed stages (each timed from cold after a sweep) ----
    // stage 1: the d11 pair generation as the op runs it
    t("d11_pairs") {
      graft.ops.Cluster.semDedupPairs(embs, "embedding", "vec_id",
        k = k, threshold = 0.4, iters = 1).count()
    }
    // stage 2: CC + verdict over a persisted pair table — the
    // marginal cost of the prune once pairs exist
    val pairsP = graft.ops.Cluster.semDedupPairs(embs, "embedding", "vec_id",
        k = k, threshold = 0.4, iters = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsP.count()
    t("cc_verdict") {
      val verdict = graft.ops.Graph.clusterDedup(pairsP, "id1", "id2")
      embs.select(col("vec_id"))
        .join(verdict, col("vec_id") === col("id"), "left_outer")
        .select(col("vec_id").as("id"),
          coalesce(col("component"), col("vec_id")).as("component"))
        .count()
    }
    pairsP.unpersist()
    // the warm repeat: what the bench's min-of-2 actually measures
    t("full_warm") { fullOp() }
    spark.stop()
  }
}
