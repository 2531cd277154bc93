package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text
import org.apache.spark.sql.Column

/** Corpus-level text analysis: language profiling, quality scoring,
  * token statistics, fingerprints, heuristic language ID. All pure
  * column math + one aggregation shuffle each.
  */
object TextAnalysis {

  private def fround(c: Column, d: Int): Column =
    graft.functions.num.fround(c, d)

  /** Per-language corpus stats. Integer sums are exact in double, so
    * sum/count + fround is deterministic at any scale.
    */
  def langProfile(docs: DataFrame, textCol: String, langCol: String,
                  nCharsCol: String): DataFrame =
    docs.select(col(langCol).as("lang"), col(nCharsCol).as("n_chars"),
        text.tokenCount(col(textCol)).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        fround(sum("n_chars").cast("double") / count(lit(1)), 4).as("avg_chars"),
        fround(sum("n_tokens").cast("double") / count(lit(1)), 4).as("avg_tokens"))

  /** Per-document quality features + score. */
  def qualityScores(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      text.tokenCount(col(textCol)).as("n_tokens"),
      text.punctCount(col(textCol)).as("n_punct"),
      text.markerHits(col(textCol), text.EnMarkers).as("n_stopwords"),
      text.qualityScore(col(textCol)).as("quality"))

  /** Global token frequency top-k (explode → count → top-k). The
    * groupBy is partial-agg friendly; the final top-k sorts only the
    * grouped vocabulary, not the corpus.
    */
  def tokenTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(text.tokens(text.normalize(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document fingerprints (content hash + cheap stats). */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      text.fingerprint(col(textCol)).as("fingerprint"),
      length(text.normalize(col(textCol))).cast("long").as("norm_len"),
      text.tokenCount(col(textCol)).as("n_tokens"))

  /** Heuristic language ID per document. */
  def languageId(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), text.langId(col(textCol)).as("lang_pred"))
}
