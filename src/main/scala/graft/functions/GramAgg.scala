package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Gram-matrix aggregator over integer-quantized vectors: folds each
  * d-wide vector q into a d×d accumulator G[i·d+j] += q_i·q_j
  * (upper triangle only — j ≥ i; the lower triangle stays 0 and is
  * filtered after the posexplode).
  *
  * This is the covariance/PCA-prep reduction a whitening pipeline
  * runs over the full corpus. One Aggregator evaluating the whole
  * outer product per input row replaces d·(d+1)/2 separate
  * `sum(q[i]*q[j])` aggregate columns: one flat long[] buffer
  * (d²·8 bytes — 32 KiB at d=64), one pass, map-side combinable
  * (ObjectHashAggregate merges partials per partition, so the
  * shuffle carries one buffer per partition, not n·d² product rows).
  *
  * All arithmetic is exact int64: |q| ≤ 127 (int8 quantization), so
  * a cell overflows only past 2⁶³/127² ≈ 5.7·10¹⁴ rows — beyond any
  * corpus. Exactness is what makes the result verifiable bit-for-bit
  * by an external engine regardless of partitioning (a double-sum
  * gram would differ by merge order).
  */
class GramAgg(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(buf: Array[Long], q: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      var k = i * d + i
      while (j < d) { buf(k) += qi * q(j); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < x.length) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = MinHashSigAgg.enc
  override def outputEncoder: Encoder[Array[Long]] = MinHashSigAgg.enc
}
