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

  /** One 64-bit base hash per element (a single string-hash pass;
    * everything downstream works on longs).
    */
  def elementHashes(elems: Column): Column = transform(elems, e => xxhash64(e))

  /** 60-bit ENGINE-PORTABLE element hash: integer fold of the first
    * 15 hex chars of md5(e) — exact BIGINT math that any engine with
    * md5 reproduces digit-for-digit (DuckDB: list_reduce over hex
    * digits; Spark: conv+cast). 15 hex digits keep the value < 2^60,
    * inside BIGINT range on engines that error on overflow.
    *
    * Used where operator OUTPUT depends on hash VALUES and therefore
    * needs a cross-engine oracle (d3's simhash fingerprints);
    * xxhash64 stays the default wherever output is hash-agnostic
    * (Jaccard counts, banding keys), since md5 costs a few× more per
    * token. Top 4 bits are always 0 — consumers treating this as a
    * 64-bit hash see constant-zero bits 60-63.
    */
  def portableElementHashes(elems: Column): Column =
    transform(elems, e => conv(substring(md5(e), 1, 15), 16, 10).cast("long"))

  /** Distinct hashes of the character k-shingles of an
    * ALREADY-NORMALIZED string column, without materializing shingle
    * strings: split to chars once (let-bound via the single-element
    * transform so it isn't re-evaluated per shingle — see
    * text.wordNgramsOfTokens), then hash k single-char slots per
    * shingle. Unambiguous because every slot is exactly one char.
    */
  def charShingleHashes(s: Column, k: Int): Column = {
    val chars = split(s, "")
    element_at(
      transform(array(chars), cs =>
        when(size(cs) < k, array().cast("array<bigint>")).otherwise(
          array_distinct(
            transform(sequence(lit(1), size(cs) - lit(k - 1)), i =>
              xxhash64((0 until k).map(j => element_at(cs, i + lit(j))): _*))))),
      1)
  }

  /** MinHash signature from pre-hashed elements. Each of the
    * `numPerm` permutations re-hashes the 64-bit base hash with a
    * distinct seed — a fixed-width xxhash64 round per slot instead of
    * a fresh variable-length string hash, so at 100 TB the string
    * pass happens once, not numPerm times. (A linear a*x+b map would
    * be cheaper still but overflows under ANSI mode.) Returns
    * array<long>; empty input → all Long.MaxValue sentinels.
    */
  def minhashFromHashes(hashes: Column, numPerm: Int): Column = {
    val sigs = (0 until numPerm).map { seed =>
      when(size(hashes) === 0, lit(Long.MaxValue)).otherwise(
        array_min(transform(hashes, h => xxhash64(lit(seed), h))))
    }
    array(sigs: _*)
  }

  /** MinHash signature straight from an element array (convenience;
    * callers on a hot path should materialize `elementHashes` once
    * and use `minhashFromHashes`).
    */
  def minhash(elems: Column, numPerm: Int): Column =
    minhashFromHashes(elementHashes(elems), numPerm)

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

  /** Per-bit votes for a 64-bit SimHash over PRE-HASHED tokens: one
    * pass, accumulating an array of 64 (+1/-1) counters. Taking longs
    * (not strings) guarantees exactly one string-hash per token — the
    * lambda var is bound once, so the 64 bit-probes share it.
    */
  def simhashVotesFromHashes(hashes: Column): Column =
    aggregate(hashes, array_repeat(lit(0L), 64), (acc, h) => {
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

  /** 64-bit SimHash of a token array (see simhashVotesFromHashes). */
  def simhash64(toks: Column): Column =
    votesToSimhash(simhashVotesFromHashes(elementHashes(toks)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
