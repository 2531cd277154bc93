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
    docs.select(explode(text.tokens(Native.normOf(docs)(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document fingerprints (content hash + cheap stats). */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = Native.normOf(docs)
    docs.select(col(idCol).as("doc_id"),
      md5(norm(col(textCol))).as("fingerprint"),
      length(norm(col(textCol))).cast("long").as("norm_len"),
      text.tokenCount(col(textCol)).as("n_tokens"))
  }

  /** Heuristic language ID per document. */
  def languageId(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), text.langId(col(textCol)).as("lang_pred"))

  /** Rolling-hash fingerprints (Rabin-Karp polynomial fold over the
    * normalized text) alongside the md5 content hash — the
    * incremental-fingerprint family for pipelines that maintain
    * hashes under streaming append. Map-only column math.
    */
  def rollingFingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        Native.normOf(docs)(col(textCol)).as("norm"))
      .select(col("doc_id"),
        text.rollingHashOfNormalized(col("norm")).as("rolling_fp"),
        length(col("norm")).cast("long").as("norm_len"))

  /** Per-group length-distribution quantiles (p25/p50/p75/p95) +
    * min/max/count — the corpus-shape profile a curation pipeline
    * reads before setting length filters.
    *
    * `exact = true` uses `percentile` (linear interpolation at
    * (n-1)·p, the same definition as DuckDB's quantile_cont, so the
    * oracle matches bit-for-bit) — it buffers each group's values, so
    * it is for bounded-cardinality groups (languages, sources).
    * `exact = false` uses `approx_percentile` (GK sketch, fixed
    * memory, partial-agg mergeable) — the 100 TB path, where a
    * ±accuracy⁻¹ rank error is the right trade and no oracle can
    * match it exactly.
    */
  def lengthQuantiles(docs: DataFrame, groupCol: String, lenCol: String,
                      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    def q(p: Double): Column =
      if (exact) percentile(col("len"), lit(p))
      else approx_percentile(col("len"), lit(p), lit(accuracy))
    docs.select(col(groupCol).as("grp"), col(lenCol).cast("double").as("len"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).cast("long").as("min_len"),
        max(col("len")).cast("long").as("max_len"),
        fround(q(0.25), 4).as("p25"),
        fround(q(0.50), 4).as("p50"),
        fround(q(0.75), 4).as("p75"),
        fround(q(0.95), 4).as("p95"))
  }
}
