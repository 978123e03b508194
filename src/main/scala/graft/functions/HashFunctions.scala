package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch primitives: MinHash signatures, SimHash fingerprints,
  * rolling-hash document fingerprints (SURVEY.md §2.4, §2.6).
  *
  * The reference dedups on murmur3_128(seed=42) of the payload
  * (Deduplicator.java:27-28); Spark's `hash()` built-in is murmur3_32
  * with the same fixed seed 42 and `xxhash64` gives 64-bit spread —
  * both codegen'd, both deterministic across runs/cluster sizes,
  * which is what the sketch family needs (a stored MinHash signature
  * must mean the same thing next year).
  */
object HashFunctions {

  /** i-th MinHash permutation value of one shingle: murmur3(shingle, i). */
  def permHash(shingle: Column, perm: Int): Column = hash(shingle, lit(perm))

  /** SimHash bit contribution: +1/-1 for bit `j` of a precomputed
    * 64-bit token hash.
    */
  def simhashBitTermFromHash(h: Column, j: Int): Column =
    when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1))

  /** Assemble a 64-bit fingerprint from 64 signed bit-sums
    * (columns `b0`..`b63`): bit j set iff sum_j > 0.
    */
  def simhashFromBitSums(bitCol: Int => Column): Column =
    (0 until 64).map { j =>
      when(bitCol(j) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Winnowed rolling-hash fingerprints (Schleimer et al.'s winnowing
    * over Rabin-Karp k-char window hashes, h = fold(h*31 + code) mod
    * 1e9+7): the sorted distinct minima of every w consecutive window
    * hashes.
    *
    * Plain Scala on purpose, driven from a typed flatMap: a rolling
    * hash is genuinely per-row imperative, and expressing it with
    * nested higher-order Column functions re-evaluates the inner
    * array per lambda element (no CSE inside lambdas) — O(len²·k) per
    * row interpreted. This version is one O(len·k) pass, map-only,
    * shuffle-free — scan speed at 100 TB.
    */
  def winnowedFingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    val hs = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + text.charAt(i + j)) % 1000000007L; j += 1 }
      hs(i) = h
      i += 1
    }
    if (hs.length < w) return Array.empty
    val mins = scala.collection.mutable.SortedSet.empty[Long]
    var s = 0
    while (s <= hs.length - w) {
      var m = Long.MaxValue
      var t = 0
      while (t < w) { if (hs(s + t) < m) m = hs(s + t); t += 1 }
      mins += m
      s += 1
    }
    mins.toArray
  }
}
