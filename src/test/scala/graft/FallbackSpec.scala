package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Similarity}
import graft.tables.Tables

/** The ops must produce identical results with native kernels disabled
  * (`graft.native.disabled`) — this exercises the pure-expression
  * fallback branches that a session without GraftExtensions would run.
  */
class FallbackSpec extends AnyFunSuite {
  import SparkHarness._

  private def withFallback[A](body: => A): A = {
    spark.conf.set("graft.native.disabled", "true")
    try body finally spark.conf.unset("graft.native.disabled")
  }

  private def run(): Seq[String] = {
    val docs = Tables(spark, sfDir).documents
    val emb = Tables(spark, sfDir).embeddings
    val probes = emb.filter(col("vec_id") % 100 === 0)
    Seq(
      Dedup.exactGroups(docs, "text", "doc_id")
        .orderBy("fingerprint").collect().mkString("|"),
      graft.ops.TextAnalysis.fingerprints(docs, "text", "doc_id")
        .orderBy("doc_id").collect().mkString("|"),
      Dedup.minhashPairs(docs, "text", "doc_id", persistIntermediate = false)
        .orderBy("id1", "id2").collect().mkString("|"),
      Dedup.simhashPairs(docs, "text", "doc_id")
        .orderBy("id1", "id2").collect().mkString("|"),
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", col("source"),
          persistIntermediate = false)
        .orderBy("id1", "id2").collect().mkString("|"),
      Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id", "label", 0.3)
        .orderBy("id1", "id2").collect().mkString("|"),
      Dedup.embeddingNearDupPairsLsh(emb, "embedding", "vec_id", 0.4, dim = 64)
        .orderBy("id1", "id2").collect().mkString("|"),
      Similarity.lshTopK(emb, probes, "embedding", "vec_id", 5, 64)
        .orderBy("query_id", "rank").collect().mkString("|"),
      Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", 5)
        .orderBy("query_id", "rank").collect().mkString("|"),
      Similarity.ivfTopK(emb, probes, "embedding", "vec_id", 5)
        .orderBy("query_id", "rank").collect().mkString("|"),
      graft.ops.TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
        .orderBy("doc_id", "pos").collect().mkString("|"))
  }

  test("fallback expression paths match native kernel results exactly") {
    val native = run()
    val fallback = withFallback(run())
    for (((n, f), i) <- native.zip(fallback).zipWithIndex)
      assert(n == f, s"op $i diverges between native and fallback")
  }
}
