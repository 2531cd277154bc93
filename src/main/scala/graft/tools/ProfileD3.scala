package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of d3_simhash (the r05 bench-honesty
  * flag): signatures / banding explode / pair join / hamming verify,
  * n repeats each, so a recorded full-op number can be decomposed
  * into which stage moved. Usage:
  *   sbt "runMain graft.tools.ProfileD3 [sfDir] [repeats]"
  */
object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def t(label: String)(f: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-12s " +
        runs.map(r => f"${r._1}%.3f").mkString(" ") + s"  rows=${runs.head._2}")
    }

    t("full") { graft.ops.Dedup.simhashPairs(docs, "text", "doc_id").count() }

    // decomposed stages over a persisted signature table (mirrors the
    // op's own persistIntermediate staging)
    val sigs = graft.ops.Dedup.simhashSigs(docs, "text", "doc_id")
    t("sigs") { sigs.count() }
    val sigsP = sigs.persist(); sigsP.count()
    val blockSizes = Seq(11, 11, 11, 11, 10, 10)
    val blockOffsets = blockSizes.scanLeft(0)(_ + _).init
    def blockOf(i: Int) =
      shiftrightunsigned(col("simhash"), blockOffsets(i))
        .bitwiseAND((1L << blockSizes(i)) - 1)
    val keyCols = (0 until 6).combinations(3).zipWithIndex.map {
      case (c, ci) => xxhash64((lit(ci) +: c.map(blockOf)): _*)
    }.toSeq
    val banded = sigsP.withColumn("band", explode(array(keyCols: _*)))
    t("banded") { banded.count() }
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .dropDuplicates("id1", "id2")
    t("pairjoin") { pairs.count() }
    t("verify") {
      pairs.withColumn("hamming",
          graft.functions.hashing.hamming64(col("s1"), col("s2")))
        .filter(col("hamming") <= 3).count()
    }
    spark.catalog.clearCache()
    t("full_warm") { graft.ops.Dedup.simhashPairs(docs, "text", "doc_id").count() }
    // isolate Par.widen's repartition: pre-widened input makes the
    // op-internal widen a no-op, so the delta vs full_warm is the
    // price of shuffling the raw text payload to 32 partitions
    val wide = docs.repartition(spark.sparkContext.defaultParallelism)
      .persist()
    wide.count()
    t("full_prewide") { graft.ops.Dedup.simhashPairs(wide, "text", "doc_id").count() }

    // bucket-pair variant: groupBy band + in-bucket pair explode —
    // one exchange for candidates instead of the self-join's two-sided
    // shuffle + sort
    val buckets = banded
      .groupBy("band").agg(collect_list(struct(col("id"), col("simhash"))).as("xs"))
      .where(size(col("xs")) >= 2)
    val nx = size(col("xs"))
    val inBucket = flatten(transform(sequence(lit(1), nx - 1), i =>
      transform(sequence(i + 1, nx), j =>
        struct(
          least(element_at(col("xs"), i).getField("id"),
            element_at(col("xs"), j).getField("id")).as("id1"),
          greatest(element_at(col("xs"), i).getField("id"),
            element_at(col("xs"), j).getField("id")).as("id2"),
          element_at(col("xs"), i).getField("simhash").as("s1"),
          element_at(col("xs"), j).getField("simhash").as("s2")))))
    val bPairs = buckets.select(explode(inBucket).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.s1").as("s1"), col("p.s2").as("s2"))
      .dropDuplicates("id1", "id2")
    t("bucketpairs") { bPairs.count() }
    t("bucketverify") {
      bPairs.withColumn("hamming",
          graft.functions.hashing.hamming64(col("s1"), col("s2")))
        .filter(col("hamming") <= 3).count()
    }
    spark.stop()
  }
}
