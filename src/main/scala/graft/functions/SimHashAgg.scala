package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SimHash aggregator: folds 64-bit token hashes into the 64 signed
  * bit-sums in one pass (buf[j] += bit_j ? +1 : -1), finishing to the
  * fingerprint long (bit j set iff sum > 0). Replaces 64 separate
  * `sum(when(...))` aggregate columns — one buffer, one tight loop,
  * map-side combinable.
  */
class SimHashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
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
}
