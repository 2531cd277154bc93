package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** A/B wall-clock harness for the r14 prefix-filter re-scope of
  * d4_ngram_jaccard / d17_containment: prices the df-ordered prefix
  * candidate path (the declared form) against sf growth, at sf0.1 and
  * sf1 — the measurement behind SURVEY §6's scale-ratio narrative
  * (the within-block full pair join it replaced measured ×21/×33 wall
  * for 10× rows on the r13 sf1 board). Usage:
  *   sbt "runMain graft.tools.AbPrefix"
  */
object AbPrefix {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"RESULT $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val d1 = spark.read.parquet("/root/repo/testdata-sf1/documents.parquet")
    // warm codegen/JIT on a slice, then measure cold-cache per SF
    Dedup.ngramJaccardPairs(d01.limit(300), "text", "doc_id", col("source"),
      persistIntermediate = false).count()
    Dedup.containmentPairs(d01.limit(300), "text", "doc_id", col("source"),
      threshold = 0.5, persistIntermediate = false).count()
    spark.catalog.clearCache()
    t("d4_sf01")(Dedup.ngramJaccardPairs(d01, "text", "doc_id", col("source")).count())
    spark.catalog.clearCache()
    t("d4_sf01_r2")(Dedup.ngramJaccardPairs(d01, "text", "doc_id", col("source")).count())
    spark.catalog.clearCache()
    t("d4_sf1")(Dedup.ngramJaccardPairs(d1, "text", "doc_id", col("source")).count())
    spark.catalog.clearCache()
    t("d4_sf1_r2")(Dedup.ngramJaccardPairs(d1, "text", "doc_id", col("source")).count())
    spark.catalog.clearCache()
    t("d17_sf01")(Dedup.containmentPairs(d01, "text", "doc_id", col("source"), threshold = 0.5).count())
    spark.catalog.clearCache()
    t("d17_sf1")(Dedup.containmentPairs(d1, "text", "doc_id", col("source"), threshold = 0.5).count())
    spark.catalog.clearCache()
    t("d17_sf1_r2")(Dedup.containmentPairs(d1, "text", "doc_id", col("source"), threshold = 0.5).count())
    spark.stop()
  }
}
