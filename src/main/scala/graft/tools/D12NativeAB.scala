package graft.tools
import org.apache.spark.sql.functions._
object D12NativeAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(): Long =
      graft.ops.Cluster.semDedupPairs(embs, "embedding", "vec_id",
        k = k, threshold = 0.4, iters = 1).count()
    for (mode <- Seq("native", "fallback", "native")) {
      if (mode == "fallback") spark.conf.set("graft.native.disabled", "true")
      else spark.conf.unset("graft.native.disabled")
      graft.GraftSession.sweep(spark)
      val t0 = System.nanoTime(); val n = pairs()
      println(f"AB $mode k=$k ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
