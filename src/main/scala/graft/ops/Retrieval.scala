package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.num.fround

/** Ranking composition — the serving-side layer over the retrieval
  * families: BM25 (t17) ranks lexically, the ANN family (s1–s15)
  * ranks by embedding distance, and production RAG corpora serve the
  * FUSION of both (hybrid retrieval), because each side structurally
  * misses what the other catches: lexical scoring is blind to
  * paraphrase, vector scoring is blind to exact identifiers, rare
  * names, and numbers.
  */
object Retrieval {

  /** RECIPROCAL-RANK FUSION (Cormack et al., SIGIR 2009) of two
    * rankings sharing the (query_id, doc_id, rank) contract:
    * rrf_score = Σ_lists 1/(k0 + rank), the standard hybrid
    * lexical+vector serving combiner — rank-based, so the two lists'
    * incomparable score scales (BM25 points vs cosine) never need
    * calibration, and a doc ranked mid-list on BOTH sides outscores a
    * doc ranked top on ONE (the consensus property the fusion exists
    * for — pinned in RetrievalSpec).
    *
    * Engine-exact FP: each list's contribution is the 6dp-floor-round
    * of 1/(k0 + rank) ([[fround]] — identical double math in any
    * engine); the fused score is ONE IEEE addition of those two
    * values via a full outer join (never a sum aggregate, so there is
    * no accumulation ORDER to pin — a + b is commutative exactly),
    * 6dp-floor-rounded once for display. Ties break on doc_id
    * ascending — the fused rank is a pure function of the two input
    * rankings.
    *
    * Scale shape: fusion runs on ranking OUTPUTS, never corpora —
    * each side carries ≤ k rows per query by construction, so the
    * join is bounded at 2k rows per query and the per-query
    * row_number window sorts ≤ 2k rows. The join keys on
    * (query_id, doc_id), one shuffle of two slim ranking tables (or a
    * broadcast when one side is a single query's list); everything
    * upstream (the actual retrieval cost) is priced by the input
    * operators themselves.
    *
    * Output: (query_id, fused_rank 1.., doc_id, rrf_score 6dp,
    * rank_lex, rank_vec) — the input ranks kept (NULL where a doc
    * appears on one list only) so a serving layer can show both
    * provenances.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k0: Int = 60): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    def contrib(rank: Column): Column =
      when(rank.isNotNull, fround(lit(1.0) / (lit(k0) + rank), 6))
        .otherwise(lit(0.0))
    val a = lex.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("rank_lex"))
    val b = vec.select(col("query_id"), col("doc_id"),
      col("rank").cast("int").as("rank_vec"))
    val fused = a.join(b, Seq("query_id", "doc_id"), "full")
      .withColumn("rrf_score",
        fround(contrib(col("rank_lex")) + contrib(col("rank_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("int"))
      .select(col("query_id"), col("fused_rank"), col("doc_id"),
        col("rrf_score"), col("rank_lex"), col("rank_vec"))
  }
}
