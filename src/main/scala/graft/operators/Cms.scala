package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch frequency monitor — the third leg of the sketch
  * family next to HLL cardinalities ([[Relational.qSketchProfile]])
  * and the Bloom membership prefilter ([[BloomDedup]]): bounded-
  * memory per-key frequency estimates with the one-sided guarantee
  * est ≥ true and, w.p. ≥ confidence, est ≤ true + eps·N. The build
  * is Spark's own `count_min_sketch` aggregate — cell arrays merge
  * map-side like any partial agg, so the full pass over 100 TB
  * reduces to one w×d integer grid on the driver; probing is O(d)
  * per key against that grid (hot-key watchlists, join-side skew
  * probes before choosing a salting factor).
  */
object Cms {

  /** Distributed build over a LONG key column. eps sizes the grid
    * (w = ⌈2/eps⌉ cells): memory is eps-bounded, NOT key-bounded —
    * that's the entire point at 10⁹ distinct keys.
    */
  def sketch(df: DataFrame, keyCol: String, eps: Double = 0.001,
             confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bin = df
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .first().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bin))
  }

  /** Point estimates for a candidate key list (watchlist probe). */
  def estimates(cms: CountMinSketch, keys: Seq[Long]): Map[Long, Long] =
    keys.map(k => k -> cms.estimateCount(Long.box(k))).toMap
}
