package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for the r14 routed assignment kernel
  * (`graft_cos_topc_routed` vs the flat `graft_cos_topc` scan): times
  * [[graft.ops.Cluster.kmeansAssign]] and the 2-probe blocking shape
  * at large k — where the flat scan's O(n·k·dim) assignment term is
  * the measured wall (the d21 scaladoc's HONEST LIMIT) and routing
  * cuts it to ~O(n·√k·dim). Results are identical on both paths (the
  * kernel's exactness contract — NativeSpec asserts it); this harness
  * prices the substitution. Usage:
  *   sbt "runMain graft.tools.ProfileRouted [sfDir] [k1,k2,...]"
  */
object ProfileRouted {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf1"
    val ks = (if (args.length > 1) args(1) else "256,1024")
      .split(",").map(_.trim.toInt).toSeq
    // row multiplier: union the corpus FAN times so the assignment
    // SCAN (O(n·k·dim)) dominates over fit bookkeeping at profile n
    val fan = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dir == "clustered:<n>:<centers>:<dim>" generates a CLUSTERED
    // corpus instead of reading parquet — the geometry where routing
    // prunes (real embedding corpora cluster hard; the isotropic
    // synthetic testdata is routing's worst case and the radius guard
    // falls back to flat there, which this harness also demonstrates)
    val base =
      if (dir.startsWith("clustered:")) {
        val Array(_, ns, cs, ds) = dir.split(":")
        val (n, nc, dim) = (ns.toInt, cs.toInt, ds.toInt)
        import spark.implicits._
        val rnd = new scala.util.Random(11)
        val centers = Array.fill(nc, dim)(rnd.nextGaussian())
        (0 until n).map { i =>
          val c = centers(i % nc)
          (i.toLong, Array.tabulate(dim)(d =>
            (c(d) + rnd.nextGaussian() * 0.05).toFloat))
        }.toDF("vec_id", "embedding")
      } else spark.read.parquet(s"$dir/embeddings.parquet")
    val embs0 = (1 until fan).foldLeft(base) { (acc, i) =>
      acc.unionByName(base.withColumn("vec_id",
        col("vec_id") + lit(i.toLong * 10000000L)))
    }
    val embs = embs0.persist()
    embs.count()
    def t(tag: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"RESULT $tag " +
        runs.map(r => f"${r._1}%.2f").mkString(" ") + s" s  rows=${runs.head._2}")
    }
    val points = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
    for (k <- ks) {
      // centroids built ONCE outside the timed region (identical for
      // both paths), so the timings isolate the pure assignment scan —
      // the O(n·k·dim) term routing exists to cut. The init-sort and
      // Lloyd-recompute costs that dominated an end-to-end A/B at
      // profile scale are identical on both paths and excluded here.
      val cents: Seq[(Long, Array[Double])] =
        points.orderBy(col("id")).limit(k).collect().zipWithIndex.map {
          case (r, i) =>
            (i.toLong, r.getSeq[Number](1).map(_.doubleValue()).toArray)
        }.toIndexedSeq
      for (routed <- Seq(true, false); _ <- 1 to 2) {
        spark.conf.set("graft.routed.disabled", (!routed).toString)
        val tag = s"k=$k ${if (routed) "routed" else "flat  "}"
        // aggregate over the ASSIGNED columns — a bare count() lets
        // Catalyst prune the assignment projection and the kernel
        // never evaluates (a vacuous 0.7 s "scan" at any k)
        t(s"assign $tag") {
          graft.ops.Cluster.assign(points, "v", cents)
            .agg(sum(col("cluster_id")), sum(col("cos"))).collect()
          0L
        }
      }
    }
    spark.conf.unset("graft.routed.disabled")
    spark.conf.unset("graft.routed.disabled")
    spark.stop()
  }
}
