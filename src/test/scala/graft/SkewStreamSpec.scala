package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew
import graft.tables.Tables

class SkewSpec extends AnyFunSuite {
  import SparkHarness._

  test("saltedCount equals direct groupBy count") {
    val e = Tables(spark, sfDir).events
    val direct = e.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedCount(e, Seq("event_type"), Seq("event_id"))
      .orderBy("event_type").collect().toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals direct join") {
    val t = Tables(spark, sfDir)
    val orders = t.orders
    val direct = orders.join(t.customer.select("c_custkey", "c_name"),
        orders("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect().toSeq
    val salted = Skew.saltedJoin(
        t.orders.withColumnRenamed("o_custkey", "custkey"),
        t.customer.select(col("c_custkey").as("custkey"), col("c_name")),
        keys = Seq("custkey"), saltBy = Seq("o_orderkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect().toSeq
    assert(salted == direct)
  }
}

class StreamDedupSpec extends AnyFunSuite {
  import SparkHarness._

  test("streaming dedupKeyed keeps one row per key") {
    import spark.implicits._
    val batch = Tables(spark, sfDir).events
      .select("event_id", "user_id", "event_type", "ts")
    // duplicate every row, then stream the union through keyed dedup
    val dup = batch.union(batch)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    dup.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(dup.schema).parquet(tmp)
    val q = graft.streaming.EventStream
      .dedupKeyed(stream, Seq("event_id"), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    val got = spark.sql("SELECT count(*) FROM dedup_out").as[Long].head()
    q.stop()
    assert(got == batch.count())
  }
}
