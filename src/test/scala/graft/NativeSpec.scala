package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{hashing, text, vectors}

/** Native codegen'd kernels must agree with the pure-expression
  * fallbacks — same values (dot: bit-identical; hashes: same sets).
  */
class NativeSpec extends AnyFunSuite {
  import SparkHarness._
  import spark.implicits._

  test("extension functions are registered in the session") {
    for (f <- Seq("graft_vector_dot", "graft_shingle_hashes", "graft_ngram_hashes"))
      assert(spark.catalog.functionExists(f), s"$f missing")
  }

  test("graft_vector_dot is bit-identical to the HOF dot") {
    val emb = tables.Tables(spark, sfDir).embeddings.limit(50)
    val both = emb.select(
      call_function("graft_vector_dot", col("embedding"), col("embedding")).as("native"),
      vectors.dot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_shingle_hashes produces the expected distinct shingle count") {
    val df = Seq("abcdefg", "aaaaaa", "abc", "").toDF("s")
    val got = df.select(size(call_function("graft_shingle_hashes", col("s"), lit(5))))
      .as[Int].collect().toSeq
    // "abcdefg": 3 shingles; "aaaaaa": 2 windows, 1 distinct; len<5: 0
    assert(got == Seq(3, 1, 0, 0))
  }

  test("graft_minhash equals the expression-built per-perm minima") {
    val docs = tables.Tables(spark, sfDir).documents.limit(20)
      .select(hashing.elementHashes(text.tokens(text.normalize(col("text")))).as("th"))
      .filter(size(col("th")) > 0)
    val exprSig = array((0 until 16).map { seed =>
      array_min(transform(col("th"), h => xxhash64(lit(seed), h)))
    }: _*)
    val both = docs.select(
      call_function("graft_minhash", col("th"), lit(16)).as("native"),
      exprSig.as("expr"))
    assert(both.filter(col("native") =!= col("expr")).count() == 0)
  }

  test("graft_simhash64 equals the expression-built simhash") {
    val docs = tables.Tables(spark, sfDir).documents.limit(20)
      .select(hashing.elementHashes(text.tokens(text.normalize(col("text")))).as("th"))
    val both = docs
      .withColumn("votes", hashing.simhashVotesFromHashes(col("th")))
      .select(
        call_function("graft_simhash64", col("th")).as("native"),
        hashing.votesToSimhash(col("votes")).as("expr"))
    assert(both.filter(col("native") =!= col("expr")).count() == 0)
  }

  test("graft_sorted_intersect_size equals array_intersect size") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L, 8L), Seq(4L, 8L))).toDF("a", "b")
    val both = df.select(
      call_function("graft_sorted_intersect_size", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("expr"))
    assert(both.filter(col("native") =!= col("expr")).count() == 0)
  }

  test("graft_ngram_hashes equals xxhash64 of the joined gram strings") {
    val docs = tables.Tables(spark, sfDir).documents.limit(20)
      .select(text.tokens(text.normalize(col("text"))).as("toks"))
    val both = docs.select(
      array_sort(call_function("graft_ngram_hashes", col("toks"), lit(3))).as("native"),
      array_sort(hashing.elementHashes(text.wordNgramsOfTokens(col("toks"), 3))).as("expr"))
    assert(both.filter(col("native") =!= col("expr")).count() == 0)
  }
}
