package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{hashing, text}

/** Document deduplication operators for LLM-training-data pipelines.
  *
  * Exact dedup generalizes the reference's idempotent keyed insert
  * (`src/db/incidents.py:41-46`) to content-addressed keys; the
  * near-dup family (MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine) is the standard web-scale dedup toolkit. All are one or two
  * shuffles on bounded keys — never an unblocked cross join.
  */
object Dedup {

  /** Exact dedup groups: normalized-content md5 → (fingerprint,
    * n_dups, canonical = min id). One shuffle on the fingerprint.
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(text.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** MinHash+LSH candidate pairs, verified with exact shingle Jaccard.
    *
    * Scale shape: map (shingle → minhash sig → band keys) is pure
    * codegen; `explode` over `bands` keys; one shuffle to co-locate
    * band buckets; within-bucket self-join emits candidates; exact
    * verify touches only candidates. No full cross join anywhere.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   numPerm: Int = 128, bands: Int = 32, shingleK: Int = 5,
                   jaccardThreshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerm / bands
    val withSig = docs.select(col(idCol).as("id"),
        text.charShingles(col(textCol), shingleK).as("shingles"))
      .withColumn("sig", hashing.minhash(col("shingles"), numPerm))
      .withColumn("band", explode(hashing.bandKeys(col("sig"), bands, rowsPerBand)))
      .select("band", "id", "shingles")
    val candidates = withSig.as("a").join(withSig.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.shingles").as("sh1"), col("b.shingles").as("sh2"))
      .dropDuplicates("id1", "id2")
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val union = size(col("sh1")) + size(col("sh2")) - size(array_intersect(col("sh1"), col("sh2")))
    candidates
      .withColumn("jaccard", round(when(union === 0, 0.0).otherwise(inter / union), 4))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc, candidates
    * from 16-bit band collisions (any doc pair within hamming<=3 of
    * each other shares at least one of 4 bands — standard pigeonhole),
    * verified by exact hamming distance.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
      hashing.simhash64(text.tokens(text.normalize(col(textCol)))).as("simhash"))
    val banded = sigs.withColumn("band",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("b"), shiftrightunsigned(col("simhash"), b * 16)
          .bitwiseAND(0xFFFFL).as("v"))
      }: _*)))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .dropDuplicates("id1", "id2")
    pairs.withColumn("hamming", hashing.hamming64(col("s1"), col("s2")))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Exact word-n-gram Jaccard within a blocking key. The blocking
    * column bounds the pair count (pairs only form inside a block);
    * callers pick a key that is skew-safe at their scale.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        blockCol: Column, n: Int = 3,
                        threshold: Double = 0.4): DataFrame = {
    val prepared = docs.select(col(idCol).as("id"),
      text.wordNgrams(col(textCol), n).as("grams"), blockCol.as("block"))
    val pairs = prepared.as("a").join(prepared.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.grams").as("g1"), col("b.grams").as("g2"))
    val inter = size(array_intersect(col("g1"), col("g2"))).cast("double")
    val union = (size(col("g1")) + size(col("g2"))
      - size(array_intersect(col("g1"), col("g2")))).cast("double")
    pairs.withColumn("jaccard", round(when(union === 0.0, 0.0).otherwise(inter / union), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Embedding-cosine near-dup pairs within a blocking column (e.g.
    * a cluster/label id): pairs with cosine >= threshold.
    */
  def embeddingNearDupPairs(embs: DataFrame, vecCol: String, idCol: String,
                            blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.vectors
    val prepared = embs.select(col(idCol).as("id"), col(vecCol).as("v"), col(blockCol).as("block"))
    prepared.as("a").join(prepared.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("cosine", vectors.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(col("cosine"), 4).as("cosine"))
  }
}
