package graft.tools

/** Re-execution audit: for every declared query, count how many times
  * each input table is SCANNED in the executed plan. A table scanned
  * k > 1 times means some upstream subtree executes per consumer —
  * the t24/t27 pattern (fixed by persisting the slim intermediate) —
  * or a legitimately two-pass algorithm (t23's sketch+recount, q37's
  * stats+bin). Prints one line per (query, table, scans>1) plus a
  * summary, so new multi-scan regressions stand out between rounds.
  * Usage: sbt "runMain graft.tools.ScanAudit [sfDir]"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    var flagged = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        // count real FileSourceScan NODES (a persisted intermediate
        // shows as InMemoryTableScan, whose cached child is NOT part
        // of this tree — so cached references don't inflate counts);
        // AQE exchange reuse can still dedupe some of these at
        // runtime, so k>1 is a POINTER, not proof of waste
        val top = fn(spark, dir).queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.inputPlan
          case p => p
        }
        val scans = top.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.headOption
              .map(_.getName).getOrElse("?")
        }
        val counts = tables.map { t =>
          (t, scans.count(_.startsWith(t)))
        }.filter(_._2 > 1)
        if (counts.nonEmpty) {
          flagged += 1
          println(s"MULTISCAN $name " +
            counts.map { case (t, c) => s"$t=$c" }.mkString(" "))
        }
      } catch {
        case e: Throwable =>
          println(s"ERROR $name ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    println(s"SUMMARY flagged=$flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
