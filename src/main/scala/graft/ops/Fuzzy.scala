package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching — the entity-resolution primitive of a
  * curation pipeline (the reference's keyed idempotent insert,
  * `src/db/incidents.py:41-46`, presumes exact keys; real-world
  * location/name columns need a typo-tolerant join before any keyed
  * merge, e.g. the geocode cache of `src/db/location.py:36-72` keyed
  * by free-text addresses).
  *
  * The join is the SYMMETRIC-DELETE (SymSpell) scheme: every distinct
  * string emits its delete neighborhood (all variants reachable by
  * deleting up to `maxDist` characters); two strings within
  * Levenshtein distance k ALWAYS share a common member of their
  * delete-k neighborhoods (remove from each side the characters the
  * optimal alignment edits — at most k per side — and the remainders
  * coincide), so the equi-join on variants has RECALL 1.0 by
  * construction and an exact `levenshtein` verify on the candidates
  * gives precision 1.0. RobustSpec asserts candidate recall against
  * the brute-force pair set.
  */
object Fuzzy {

  /** Delete neighborhood of `s` up to `maxDeletes` ∈ {1, 2}: the
    * string itself, every single-character deletion, and (k = 2)
    * every two-character deletion — O(len²) variants, all generated
    * inside whole-stage codegen (sequence/transform HOFs, no UDF).
    * Beyond k = 2 the neighborhood grows O(len^k); use q-gram
    * count filtering instead of deletes at that radius.
    */
  def deleteVariants(s: Column, maxDeletes: Int): Column = {
    require(maxDeletes == 1 || maxDeletes == 2,
      s"maxDeletes must be 1 or 2, got $maxDeletes")
    val len = length(s)
    // delete position i (1-based): prefix [1, i) ++ suffix (i, len]
    val d1 = transform(sequence(lit(1), len),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, len - i)))
    // delete positions i < j: three surviving slices. Outer sequence
    // stops at len - 1 so the inner sequence(i + 1, len) is always
    // ascending (Spark's sequence DESCENDS when start > stop).
    val d2 = flatten(transform(sequence(lit(1), len - 1),
      i => transform(sequence(i + 1, len),
        j => concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
          s.substr(j + 1, len - j)))))
    val parts = array(s) +:
      (when(len >= 1, d1).otherwise(array()) +:
        (if (maxDeletes == 2) Seq(when(len >= 2, d2).otherwise(array()))
         else Seq.empty))
    array_distinct(concat(parts: _*))
  }

  /** Typo-tolerant self-join over the DISTINCT values of `nameCol`:
    * all unordered pairs of distinct names within Levenshtein
    * distance `maxDist`, with each name's row count — the merge
    * worklist of an entity-resolution pass.
    *
    * Scale shape: the corpus collapses to its name DICTIONARY first
    * (one partial-agg shuffle; distinct names grow far slower than
    * rows), the delete-neighborhood explode is O(len²) per DICTIONARY
    * entry, candidates form on a variant equi-join (never a cross
    * join), and the exact levenshtein verify touches candidates only.
    * Output is bounded by the true-match count, so joining it back to
    * the corpus broadcasts.
    */
  def fuzzyNameJoin(df: DataFrame, nameCol: String,
                    maxDist: Int = 2): DataFrame = {
    val dict = df.where(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("cnt"))
    val vars = dict.select(col("name"), col("cnt"),
      explode(deleteVariants(col("name"), maxDist)).as("v"))
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.cnt").as("n_a"), col("b.cnt").as("n_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        col("n_a"), col("n_b"))
  }

  /** Full entity resolution over `nameCol`: fuzzy pairs
    * ([[fuzzyNameJoin]]) → transitive clusters (connected components)
    * → one CANONICAL spelling per cluster (the most frequent name,
    * ties to the lexicographically smallest) — the name→canonical
    * mapping a merge/geocode-cache pass applies. Every distinct name
    * appears in the output; names with no fuzzy match are their own
    * singleton cluster.
    *
    * Vertex ids for the component step are the portable 60-bit md5
    * prefix of the name (the [[graft.functions.hashing]] idiom), so
    * the clustering is engine-reproducible. Scale shape: everything
    * downstream of the corpus count runs at DICTIONARY size — the CC
    * input is the (bounded) true-match pair set, the canonical pick
    * is one partial-agg shuffle on component plus a dictionary-sized
    * join back.
    */
  def entityResolve(df: DataFrame, nameCol: String,
                    maxDist: Int = 2): DataFrame = {
    val hid = (c: Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val dict = df.where(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("cnt"))
    val pairs = fuzzyNameJoin(df, nameCol, maxDist)
      .select(hid(col("name_a")).as("ida"), hid(col("name_b")).as("idb"))
    val cc = Graph.connectedComponents(pairs, "ida", "idb")
    val labeled = dict
      .join(cc, hid(col("name")) === col("id"), "left_outer")
      .select(col("name"), col("cnt"),
        coalesce(col("comp"), hid(col("name"))).as("component"))
    // canonical = max cnt, tie-break min name: min over (-cnt, name).
    // Struct min/max is sort-agg (no hash buffer for structs) but
    // still partial-aggregates; the grouped table is component-sized.
    val canon = labeled.groupBy("component")
      .agg(min(struct((lit(0L) - col("cnt")).as("neg"),
          col("name").as("nm"))).as("c"),
        count(lit(1)).as("cluster_size"), sum("cnt").as("n_rows"))
      .select(col("component"), col("c.nm").as("canonical"),
        col("cluster_size"), col("n_rows"))
    labeled.join(canon, "component")
      .select(col("name"), col("canonical"), col("cnt"),
        col("cluster_size"), col("n_rows"),
        when(col("name") === col("canonical"), 1).otherwise(0)
          .as("is_canonical"))
  }
}
