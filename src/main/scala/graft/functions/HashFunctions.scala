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
