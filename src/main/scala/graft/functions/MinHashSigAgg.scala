package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature aggregator: folds 64-bit shingle hashes into a
  * `perms`-wide signature of universal-hash minima,
  * sig[i] = min over shingles of (a_i·h + b_i) (64-bit wrap-around
  * multiply-add permutation family, constants from a splitmix64
  * stream — deterministic forever, so stored signatures stay
  * comparable).
  *
  * One Aggregator evaluating all permutations per input row replaces
  * 128 separate `min(hash(sh, i))` aggregate columns: one buffer,
  * one pass, tight long[] loop, map-side combinable (Spark's
  * ObjectHashAggregate keeps the array buffer live and merges
  * partials per partition — the shuffle carries one signature per
  * (partition, doc), not 2M shingle rows).
  */
class MinHashSigAgg(perms: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  // odd multipliers + offsets, fixed by permutation index
  private val as: Array[Long] = Array.tabulate(perms)(i => splitmix(i.toLong * 2 + 1) | 1L)
  private val bs: Array[Long] = Array.tabulate(perms)(i => splitmix(i.toLong * 2 + 2))

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < perms) {
      val v = as(i) * h + bs(i)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // array<bigint> on the wire and in the output column (element_at
  // works downstream); MinHashSigAgg.enc comes from SQLImplicits.
  override def bufferEncoder: Encoder[Array[Long]] = MinHashSigAgg.enc
  override def outputEncoder: Encoder[Array[Long]] = MinHashSigAgg.enc
}

object MinHashSigAgg {
  // encoder derivation only — the Dataset-holder members are unused
  private object Impl extends org.apache.spark.sql.EncoderImplicits
  val enc: Encoder[Array[Long]] = Impl.newLongArrayEncoder
}
