package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** The persisted-tokenizer train/apply split (the nbFitModel /
  * nbScoreWithModel construction for both production tokenizers):
  *  - model-as-input reproduces the refit-inline operator
  *    BIT-IDENTICALLY through a parquet round-trip (the same rows are
  *    the only state, the same expressions do the applying);
  *  - a corpus-B apply under corpus-A's vocabulary has defined
  *    cross-corpus semantics (BPE: byte-fallback single chars, no
  *    UNK; unigram: unseen-character / over-length words are UNK);
  *  - the fit-config markers make mismatched apply knobs and
  *    truncated model tables fail LOUD, never segment silently wrong.
  */
class TokenizerModelSpec extends AnyFunSuite {
  import SparkHarness._
  import spark.implicits._

  private def corpusA = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran to the hat"),
    (3L, "a rat sat on a hat"),
    (4L, "the bat and the cat and the rat")).toDF("doc_id", "text")

  // corpus B: overlapping vocabulary plus words with characters the
  // trainer never saw ('z', 'x') and one word over the length bound
  private def corpusB = Seq(
    (10L, "the cat sat on a zebra"),
    (11L, "xylophone rat mat"),
    (12L, "a supercalifragilistic hat")).toDF("doc_id", "text")

  test("bpeFitModel + bpeSegmentWithModel reproduce bpeSegment bit-for-bit through a parquet round-trip") {
    val direct = TextAnalysis.bpeSegment(corpusA, "text", merges = 6)
      .orderBy("piece").collect().toSeq
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpemodel").toString + "/model"
    TextAnalysis.bpeFitModel(corpusA, "text", merges = 6).write.parquet(path)
    val model = spark.read.parquet(path)
    val viaModel = TextAnalysis.bpeSegmentWithModel(corpusA, "text", model)
      .orderBy("piece").collect().toSeq
    assert(viaModel == direct,
      "persisted-model segmentation diverges from the one-call operator")
    assert(direct.nonEmpty)
    // the model table equals the bpeTrain merge table plus one marker
    val trained = TextAnalysis.bpeTrain(corpusA, "text", merges = 6)
      .orderBy("step").collect().toSeq
    val modelMerges = model.filter(col("step") > 0)
      .orderBy("step").collect().toSeq
    assert(modelMerges == trained,
      "fit model's merge rows must equal the bpeTrain table")
    assert(model.filter(col("step") === 0).count() == 1L)
  }

  test("bpeSegmentWithModel: corpus-B apply under corpus-A merges — byte fallback, trained merges still fire") {
    val model = TextAnalysis.bpeFitModel(corpusA, "text", merges = 6)
    val pieces = TextAnalysis.bpeSegmentWithModel(corpusB, "text", model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // characters never seen in training stay single-character pieces
    // (byte-fallback): 'z' from zebra, 'x' from xylophone
    assert(pieces.contains("z"), pieces.keys.toSeq.sorted.mkString(","))
    assert(pieces.contains("x"), pieces.keys.toSeq.sorted.mkString(","))
    // corpus-A's dominant merge ("th"+"e" family trained from 'the')
    // fires inside corpus-B words that contain the pair
    assert(pieces.keys.exists(_.length > 1),
      "trained merges must still apply to corpus B")
    // every piece is non-empty and the rollup is corpus-weighted
    assert(pieces.keys.forall(_.nonEmpty) && pieces.values.forall(_ > 0))
  }

  test("bpeSegmentWithModel: truncated or marker-less model tables fail loud") {
    val model = TextAnalysis.bpeFitModel(corpusA, "text", merges = 6)
    // a filtered-out middle merge breaks step contiguity
    val gap = intercept[IllegalArgumentException] {
      TextAnalysis.bpeSegmentWithModel(corpusA, "text",
        model.filter(col("step") =!= 3))
    }
    assert(gap.getMessage.contains("contiguous"), gap.getMessage)
    // a dropped TAIL merge keeps contiguity but disagrees with the
    // marker's learned-merge count
    val truncated = intercept[IllegalArgumentException] {
      TextAnalysis.bpeSegmentWithModel(corpusA, "text",
        model.filter(col("step") =!= 6))
    }
    assert(truncated.getMessage.contains("truncated"), truncated.getMessage)
    // a table that never came from bpeFitModel (no marker row)
    val noMarker = intercept[IllegalArgumentException] {
      TextAnalysis.bpeSegmentWithModel(corpusA, "text",
        model.filter(col("step") > 0))
    }
    assert(noMarker.getMessage.contains("bpeFitModel"), noMarker.getMessage)
    // the fit side enforces bpeTrain's merges bound too (r12 advice):
    // merges > 64 would break the <= 65-row bounded-model contract,
    // merges = 0 would silently fit a no-op model the apply accepts
    for (bad <- Seq(0, 65)) {
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.bpeFitModel(corpusA, "text", merges = bad)
      }
      assert(e.getMessage.contains("merges must be in [1, 64]"), e.getMessage)
    }
  }

  test("unigramFitModel + unigramSegmentWithModel reproduce tokenizerCost bit-for-bit through a parquet round-trip") {
    val docs = graft.tables.Tables(spark, "/root/testdata/sf0.001").documents
    val train = substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), lit("graft"))), 1, 4) < "e666"
    val direct = TextAnalysis.tokenizerCost(docs, "text", "doc_id", train,
        seedSize = 64, iters = 1)
      .orderBy("doc_id").collect().mkString("|")
    val path = java.nio.file.Files
      .createTempDirectory("graft_unimodel").toString + "/model"
    TextAnalysis.unigramFitModel(docs.filter(train), "text",
      seedSize = 64, iters = 1).write.parquet(path)
    val model = spark.read.parquet(path)
    val viaModel = TextAnalysis.unigramSegmentWithModel(docs, "text",
        "doc_id", model)
      .orderBy("doc_id").collect().mkString("|")
    assert(viaModel == direct,
      "persisted-model segmentation diverges from the refit-inline operator")
    assert(viaModel.nonEmpty)
    // bounded artifact: trained rows + exactly two config markers
    assert(model.count() <= 64L + 36L + 2L)
    assert(model.filter(col("logp") === 0.0 && col("cnt").isin(4L, 16L))
      .count() >= 2L)
  }

  test("unigramSegmentWithModel: corpus-B apply — unseen-character and over-length words are UNK") {
    val model = TextAnalysis.unigramFitModel(corpusA, "text", seedSize = 32)
    val got = TextAnalysis.unigramSegmentWithModel(corpusB, "text",
        "doc_id", model)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // doc 10: 'zebra' has an untrained char -> 1 UNK of 6 words
    assert(got(10L) == ((6L, 1L)), got.toString)
    // doc 11: 'xylophone' UNK, 'rat'/'mat' segmentable
    assert(got(11L) == ((3L, 1L)), got.toString)
    // doc 12: 'supercalifragilistic' exceeds maxWordLen=16 -> UNK even
    // though every character is trained
    assert(got(12L)._2 >= 1L, got.toString)
    // non-UNK words still segment: every doc has pieces
    val pieces = TextAnalysis.unigramSegmentWithModel(corpusB, "text",
      "doc_id", model).agg(sum("n_pieces")).head().getLong(0)
    assert(pieces > 0L)
  }

  test("unigramSegmentWithModel: mismatched apply knobs and marker-less tables fail loud") {
    val model = TextAnalysis.unigramFitModel(corpusA, "text", seedSize = 32)
    val wrongPiece = intercept[IllegalArgumentException] {
      TextAnalysis.unigramSegmentWithModel(corpusB, "text", "doc_id",
        model, maxPieceLen = 3)
    }
    assert(wrongPiece.getMessage.contains("maxPieceLen=4"), wrongPiece.getMessage)
    val wrongWord = intercept[IllegalArgumentException] {
      TextAnalysis.unigramSegmentWithModel(corpusB, "text", "doc_id",
        model, maxWordLen = 12)
    }
    assert(wrongWord.getMessage.contains("maxWordLen=16"), wrongWord.getMessage)
    // a bare vocabulary that never came from unigramFitModel
    val noMarker = intercept[IllegalArgumentException] {
      TextAnalysis.unigramSegmentWithModel(corpusB, "text", "doc_id",
        TextAnalysis.unigramLmTrain(corpusA, "text", seedSize = 32))
    }
    assert(noMarker.getMessage.contains("unigramFitModel"), noMarker.getMessage)
  }

  test("unigramLmTrain caps seedSize (bounds the per-round driver collect)") {
    val docs = Seq("a b c").toDF("text")
    val over = intercept[IllegalArgumentException] {
      TextAnalysis.unigramLmTrain(docs, "text", seedSize = 65537)
    }
    assert(over.getMessage.contains("65536"), over.getMessage)
  }

  test("g5/g6 distributed oracle twins are declared and share g4/g1 SQL") {
    assert(SparkEntry.queries.contains("g5_cc_distributed"))
    assert(SparkEntry.queries.contains("g6_pagerank_distributed"))
    assert(SparkEntry.oracleSql("g5_cc_distributed") ==
      SparkEntry.oracleSql("g4_cc_incremental"))
    assert(SparkEntry.oracleSql("g6_pagerank_distributed") ==
      SparkEntry.oracleSql("g1_pagerank"))
  }
}
