package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of s12_ann_rerank (the r06 unpriced
  * 9.26 s flag): s7's pqTopK at k=5 vs the same scan at k=50 (stage 1)
  * vs the full two-stage rerank, plus the rerank joins in isolation
  * over a precomputed candidate table — so the full-op number
  * decomposes into fit+scan / k=50 ranking delta / rerank delta.
  * Usage:
  *   sbt "runMain graft.tools.ProfileS12 [sfDir] [repeats]"
  */
object ProfileS12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = emb.filter(col("vec_id") % 100 === 0)
    println(s"corpus=${emb.count()} probes=${probes.count()}")

    def t(label: String)(f: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-16s " +
        runs.map(r => f"${r._1}%.3f").mkString(" ") + s"  rows=${runs.head._2}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // the three op-level measurements the decomposition hangs off
    t("s7_pq_k5") {
      graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 5).count()
    }
    t("stage1_pq_k50") {
      graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 50).count()
    }
    t("s12_full") {
      graft.ops.Similarity.pqRerankTopK(emb, probes, "embedding", "vec_id",
        5, candidates = 50).count()
    }

    // the DECLARED s7 shape: + final orderBy — isolates the cost of
    // the output sort's range exchange over the tiny result
    t("s7_declared") {
      graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 5)
        .orderBy(col("query_id"), col("rank")).count()
    }
    // fit-cost share: lloydIters=0 drops the one Lloyd scan+collect,
    // keeping init collect + encode + ADC scan + ranking
    t("pq_k50_lloyd0") {
      graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 50,
        lloydIters = 0).count()
    }
    // native off: expression argmin + window ranking paths
    t("pq_k50_noext") {
      spark.conf.set("graft.native.disabled", "true")
      try graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 50).count()
      finally spark.conf.set("graft.native.disabled", "false")
    }

    // fit vs plan vs execute: the pqTopK CALL runs the eager fit jobs
    // (dim probe, init collect, Lloyd); executedPlan materialization is
    // pure driver analysis/optimization/planning; count() is execution
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      val df = graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 50)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"PROF split fit=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f " +
        f"exec=${(t3 - t2) / 1e9}%.3f rows=$n")
      spark.catalog.clearCache()
    }

    // rerank stage in isolation: candidates precomputed + persisted, so
    // the measured cost is ONLY the two broadcast joins + exact cosine
    // + final top-5
    val cand = graft.ops.Similarity.pqTopK(emb, probes, "embedding", "vec_id", 50)
      .select(col("query_id"), col("neighbor_id")).persist()
    cand.count()
    t("rerank_only") {
      val dot = graft.functions.vectors.dot _
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
      val p = probes.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
      val nn = col("qn") * col("cn")
      val scored = c.join(broadcast(cand), Seq("neighbor_id"))
        .join(broadcast(p), Seq("query_id"))
        .withColumn("cosine",
          when(nn === 0.0, 0.0).otherwise(dot(col("qv"), col("cv")) / nn))
      graft.ops.Similarity.topKPerQuery(scored, 5).count()
    }
    cand.unpersist()
    spark.stop()
  }
}
