package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SimHash aggregator: folds tokens into the 64 signed bit-sums in
  * one pass (buf[j] += bit_j ? +1 : -1), finishing to the fingerprint
  * long (bit j set iff sum > 0). Replaces 64 separate `sum(when(...))`
  * aggregate columns — one buffer, one tight loop, map-side
  * combinable.
  *
  * The per-token 64-bit hash is the big-endian first 8 bytes of
  * MD5(UTF-8 token) — chosen over xxhash64 because every engine has
  * MD5, so an external oracle (DuckDB here) can recompute identical
  * fingerprints from the raw text; xxhash64 exists only inside Spark.
  */
class SimHashAgg extends Aggregator[String, Array[Int], Long] {

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    val h = SimHashAgg.md5Long(md, tok)
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
      j += 1
    }
    buf
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { x(j) += y(j); j += 1 }
    x
  }

  override def finish(buf: Array[Int]): Long = {
    var fp = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def bufferEncoder: Encoder[Array[Int]] = SimHashAgg.bufEnc
  override def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
}

object SimHashAgg {
  private object Impl extends org.apache.spark.sql.EncoderImplicits
  val bufEnc: Encoder[Array[Int]] = Impl.newIntArrayEncoder

  /** Big-endian long from the first 8 bytes of MD5(UTF-8 s): bit 63
    * is the top bit of the first hex digit — the same value an oracle
    * gets by parsing substr(md5_hex, 1, 16) as an integer.
    */
  def md5Long(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }
}
