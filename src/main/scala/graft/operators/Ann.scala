package graft.operators

import graft.Tables
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table (SURVEY.md §2.5).
  *
  * `annBruteForce` is the exact correctness baseline: broadcast the
  * (small) query set against the full corpus — a map-only pass plus
  * one shuffle for the per-query top-k. `annLsh` is the 100 TB path:
  * random-hyperplane signatures bucket the corpus so each query only
  * scans its bucket (plus probing neighbors), trading bounded recall
  * for a ~2^bits reduction in scanned rows.
  */
object Ann {

  /** Exact cosine top-k for queries (vec_id < nQueries), self-matches
    * excluded. Query side is broadcast — no corpus shuffle before the
    * top-k; row_number picks k with a vec_id tiebreak.
    */
  def annBruteForce(spark: SparkSession, dir: String,
                    nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), V.normSq(col("embedding")).as("n2"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val sim = V.cosineWithNorms(V.dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), sim.as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: component h of plane p
    * is a fixed rational derived from murmur-style integer mixing —
    * reproducible across runs with no RNG state.
    */
  private def planeComponent(p: Int, h: Int): Double = {
    var x = p.toLong * 2654435761L + h.toLong * 40503L + 42L
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    // map to (-1, 1)
    (x & 0xFFFFFFL).toDouble / 0x800000L.toDouble - 1.0
  }

  /** Random-hyperplane LSH ANN, multi-table multi-probe: `tables`
    * independent `bits`-bit sign signatures bucket the corpus; each
    * query probes its bucket plus every single-bit flip in every
    * table, unions candidates, and exact cosine reranks the
    * survivors. Scanned fraction ≈ tables·(bits+1)/2^bits of the
    * corpus instead of 100% — the brute-force baseline is
    * [[annBruteForce]]; recall/cost tunes via (tables, bits).
    */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 10,
             k: Int = 5, bits: Int = 8, tables: Int = 4): DataFrame = {
    val dim = 64
    def signature(t: Int, emb: org.apache.spark.sql.Column) =
      (0 until bits).map { p =>
        val plane = (0 until dim).map(h => planeComponent(t * bits + p, h))
        val proj = graft.plans.VecDot(emb, typedlit(plane))
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), V.normSq(col("embedding")).as("n2"))
    val e = base.select(col("vec_id"), col("embedding"), col("n2"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signature(t, col("embedding")).as("sig"))): _*)).as("ts"))
      .select(col("vec_id"), col("embedding"), col("n2"),
        col("ts.t").as("t"), col("ts.sig").as("sig"))
    // probes: each table's own bucket + every single-bit flip
    val flips = array((lit(0L) +: (0 until bits).map(b => lit(1L << b))): _*)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("t"), explode(flips).as("flip"), col("sig"))
      .select(col("q_id"), col("q_emb"), col("q_n2"), col("t").as("qt"),
        col("sig").bitwiseXOR(col("flip")).as("probe_sig"))
    val sim = V.cosineWithNorms(V.dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(q).join(e,
        col("qt") === col("t") && col("probe_sig") === col("sig") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), sim.as("sim"))
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 6).as("sim"))
  }
}
