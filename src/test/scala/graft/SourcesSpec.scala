package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.tables.Tables

class SourcesSpec extends AnyFunSuite {
  import SparkHarness._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows and schema-declared types") {
    val orig = Tables(spark, sfDir).nation
    val dir = tmp("graft-csv")
    Sources.writeCsv(orig, dir)
    val back = Sources.readCsv(spark, dir, orig.schema)
    assert(back.schema == orig.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      orig.orderBy("n_nationkey").collect().toSeq)
  }

  test("jsonl round-trip preserves rows") {
    val orig = Tables(spark, sfDir).region
    val dir = tmp("graft-jsonl")
    Sources.writeJsonl(orig, dir)
    val back = Sources.readJsonl(spark, dir, orig.schema)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      orig.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val orig = Tables(spark, sfDir).customer
    val dir = tmp("graft-part")
    Sources.writeParquet(orig, dir, partitionBy = Seq("c_mktsegment"))
    val one = Sources.readParquet(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val expected = orig.filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() == expected)
    // partition pruning: the physical scan must carry a partition filter
    val physical = one.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("c_mktsegment"),
      s"expected partition pruning in plan:\n$physical")
  }
}
