package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.text

/** Corpus-curation operators for LLM-training-data pipelines: PII
  * scrubbing, deterministic train/val/test splitting, and token-budget
  * sequence packing. All are pure column math or bounded window ops —
  * no UDFs, no driver-side loops, no unbounded state.
  */
object Curation {

  /** Email/phone patterns chosen to mean the same thing in Java regex
    * (Spark) and RE2 (DuckDB oracle): character classes, bounded
    * repetition, no backrefs or lookaround.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub: replace emails/phones with typed placeholders and
    * count what was redacted. Emails are replaced BEFORE phones so a
    * digit run inside an address is never double-redacted; the counts
    * are taken on the raw text with the same precedence. Pure per-row
    * codegen'd column math — scales as a map-only stage.
    */
  def scrubPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val raw = col(textCol)
    val noEmail = regexp_replace(raw, EmailPattern, "<EMAIL>")
    df.select(
      col(idCol),
      regexp_replace(noEmail, PhonePattern, "<PHONE>").as("clean_text"),
      size(regexp_extract_all(raw, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(PhonePattern), lit(0))).cast("long").as("n_phones"))
  }

  /** Deterministic, engine-portable split assignment.
    *
    * Bucket = first 4 hex chars of md5(key || ':' || salt) — a uniform
    * draw over 65536 values that any engine computing md5 reproduces
    * bit-for-bit (no engine RNG, no numeric hex decode; plain
    * lexicographic compare on lowercase hex, where ASCII order is
    * value order). A doc's split is a pure function of (key, salt):
    * stable across runs, engines, partitionings, and corpus growth —
    * adding documents never reassigns existing ones, which is the
    * property that keeps eval sets honest as a corpus accretes.
    *
    * `fractions` maps label → fraction, in priority order; they must
    * sum to 1. Scale shape: map-only, no shuffle.
    */
  def deterministicSplit(df: DataFrame, keyCol: String, salt: String,
                         fractions: Seq[(String, Double)],
                         outCol: String = "split"): DataFrame = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bucket = substring(
      md5(concat(col(keyCol).cast("string"), lit(":"), lit(salt))), 1, 4)
    val withBucket = df.withColumn("bucket", bucket)
    val thresholds = splitThresholds(fractions)
    val assigned = thresholds.init.foldLeft(when(lit(false), lit(""))) {
      case (acc, (label, thr)) => acc.when(col("bucket") < lit(thr), lit(label))
    }.otherwise(lit(thresholds.last._1))
    withBucket.withColumn(outCol, assigned)
  }

  /** (label, exclusive upper hex threshold) per fraction; the last
    * label absorbs the remainder. Shared with the SQL oracle so both
    * engines compare against identical literals.
    */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.map(_._1).zip(cum).map { case (label, c) =>
      (label, f"${math.min(math.floor(c * 65536).toLong, 65535L)}%04x")
    }
  }

  /** Token-budget sequence packing (concatenate-and-chunk): documents
    * are laid out in `idCol` order within each shard, and `pack_id` is
    * the chunk of `budgetTokens` tokens in which a document STARTS
    * (floor of the exclusive prefix token count / budget) —
    * `pack_offset` is its token offset inside that chunk. This is the
    * standard pack-then-split layout LLM trainers feed (documents are
    * concatenated in a deterministic order and the stream is cut every
    * `budgetTokens`); emitting the (doc → pack, offset) map instead of
    * materialized packs keeps the operator a pure metadata pass.
    *
    * Scale shape: one window per shard — the shard column IS the
    * parallelism contract (one output file / writer per shard, like
    * the training data layout itself); token counting is map-side.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(shardCol).as("shard"), col(idCol),
        text.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("prev_tokens", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("shard"), col(idCol), col("n_tokens"),
        floor(col("prev_tokens") / budgetTokens).cast("long").as("pack_id"),
        (col("prev_tokens") % budgetTokens).as("pack_offset"))
  }
}
