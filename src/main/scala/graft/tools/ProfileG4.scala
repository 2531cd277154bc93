package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of g4_cc_incremental (r07 verdict:
  * second consecutive driver record above its documented 2.52-3.18
  * local[32] band). Stages: the d5-shaped pair generation (shared by
  * both splits via localCheckpoint), the base-split CC, and the
  * contracted-delta incremental merge — so the recorded number
  * decomposes into pair generation vs the iterative graph work.
  * Usage:
  *   sbt "runMain graft.tools.ProfileG4 [sfDir] [repeats]"
  */
object ProfileG4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
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

    def isOld = pmod(col("id1") * 31 + col("id2"), lit(10)) < 7
    def fullOp(): Long = {
      val pairs = graft.ops.Dedup.embeddingNearDupPairs(embs,
          "embedding", "vec_id", "label", 0.35)
        .localCheckpoint(true)
      val base = graft.ops.Graph.connectedComponents(pairs.where(isOld), "id1", "id2")
      graft.ops.Graph.incrementalComponents(base, "id", "comp",
        pairs.where(!isOld), "id1", "id2").count()
    }
    t("full") { fullOp() }
    graft.GraftSession.sweep(spark)

    // stage 1: pair generation alone (incl. the localCheckpoint write
    // the declared query pays so both splits never re-pair)
    t("pairs_ckpt") {
      graft.ops.Dedup.embeddingNearDupPairs(embs,
        "embedding", "vec_id", "label", 0.35).localCheckpoint(true).count()
    }
    // stages 2+3 over a persisted pair table: the graph work alone
    val pairsP = graft.ops.Dedup.embeddingNearDupPairs(embs,
        "embedding", "vec_id", "label", 0.35)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsP.count()
    t("base_cc") {
      graft.ops.Graph.connectedComponents(pairsP.where(isOld), "id1", "id2").count()
    }
    val baseP = graft.ops.Graph.connectedComponents(pairsP.where(isOld), "id1", "id2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    baseP.count()
    t("delta_merge") {
      graft.ops.Graph.incrementalComponents(baseP, "id", "comp",
        pairsP.where(!isOld), "id1", "id2").count()
    }
    pairsP.unpersist(); baseP.unpersist()
    t("full_warm") { fullOp() }
    spark.stop()
  }
}
