object T24Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("t24_dsir_select")(spark, "/root/testdata/sf0.01")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    for (p <- Seq("ReusedExchange", "ShuffleQueryStage", "Exchange", "Generate", "md5")) 
      println(p + "=" + p.r.findAllIn(plan).length)
    val ids = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    println("stage_ids=" + ids.mkString(","))
    spark.stop()
  }
}
