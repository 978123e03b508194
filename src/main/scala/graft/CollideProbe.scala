package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-replica vocabulary collision probe for ScaleGen output
  * (VERDICT r8 item #2): measures the fraction of distinct tokens and
  * distinct word-3-shingles that appear in MORE THAN ONE replica of a
  * scaled documents table. The exact-pair soak families' byte growth
  * is only an honest scale reading if replica vocabularies are
  * disjoint (real corpus growth adds new vocabulary; it does not
  * alias old vocabulary) — bare letter-bijection replicas pigeonhole
  * short tokens into colliding images, which this probe exposed at
  * factor 100 before the per-replica token tags landed.
  *
  * Usage: runMain graft.CollideProbe <scaledDir> — prints one JSON
  * line with distinct counts and cross-replica rates (expect ~0 for
  * a tagged corpus; replica membership is doc_id div the ScaleGen key
  * offset). Both measurements are single groupBy aggregates over the
  * token / shingle space — the same shuffle shape as the df profile
  * the jaccard prelude computes, so the probe runs wherever the soak
  * runs.
  */
object CollideProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = lit(100000000L) // ScaleGen.Off
    val docs = Tables.documents(spark, dir)
      .select((col("doc_id") / off).cast("long").as("replica"), col("text"))

    def crossRate(exploded: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = exploded
        .groupBy("k").agg(count_distinct(col("replica")).as("nr"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_cross"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    val toks = docs.select(col("replica"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("k"))
    val (nTok, xTok) = crossRate(toks)

    val shingles = docs.select(col("replica"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("k"))
    val (nSh, xSh) = crossRate(shingles)

    def rate(x: Long, n: Long): String =
      String.format(java.util.Locale.ROOT, "%.6f",
        Double.box(if (n == 0) 0.0 else x.toDouble / n))
    println(s"""{"collide_probe":"$dir","distinct_tokens":$nTok,"cross_replica_tokens":$xTok,"token_cross_rate":${rate(xTok, nTok)},"distinct_shingles":$nSh,"cross_replica_shingles":$xSh,"shingle_cross_rate":${rate(xSh, nSh)}}""")
    spark.stop()
  }
}
