package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash primitives as Column builders.
  *
  * All hashes derive from Spark's codegen'd `xxhash64` with per-
  * permutation seeds, so signatures are deterministic, cheap, and
  * computed fully inside whole-stage codegen — no driver loops, no
  * UDFs. At 100 TB this is a pure map stage.
  */
object hashing {

  /** MinHash signature: for each of `numPerm` seeded hash functions,
    * the min hash over the element array. Returns array<long> of
    * length numPerm; empty input → all Long.MaxValue sentinels.
    */
  def minhash(elems: Column, numPerm: Int): Column = {
    val sigs = (0 until numPerm).map { seed =>
      when(size(elems) === 0, lit(Long.MaxValue)).otherwise(
        array_min(transform(elems, e => xxhash64(lit(seed), e))))
    }
    array(sigs: _*)
  }

  /** LSH band keys for a minhash signature: `bands` keys, each hashing
    * `rowsPerBand` consecutive signature slots together with the band
    * index (so buckets from different bands never collide).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }
    array(keys: _*)
  }

  /** Per-bit votes for a 64-bit SimHash over a token array: one pass,
    * accumulating an array of 64 (+1/-1) counters. Subexpression
    * elimination keeps it to one xxhash64 per token.
    */
  def simhashVotes(toks: Column): Column =
    aggregate(toks, array_repeat(lit(0L), 64), (acc, t) => {
      val h = xxhash64(t)
      val bitVotes = array((0 until 64).map { i =>
        when(shiftright(h, i).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L))
      }: _*)
      zip_with(acc, bitVotes, (a, v) => a + v)
    })

  /** Collapse the 64 vote counters into the SimHash fingerprint. */
  def votesToSimhash(votes: Column): Column =
    (0 until 64).map { i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** 64-bit SimHash of a token array (see simhashVotes). */
  def simhash64(toks: Column): Column = votesToSimhash(simhashVotes(toks))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
