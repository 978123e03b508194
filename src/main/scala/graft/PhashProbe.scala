package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off structure probe for the phash family at scale: distinct
  * fingerprints, largest fingerprint multiplicity, and the banded
  * candidate/true-pair counts OVER DISTINCT FINGERPRINTS (the
  * collapse-rendering sizes). Usage: runMain graft.PhashProbe <dir>
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.plans.BlockHash(col("text").cast("binary")).as("bs"))
    val byFp = fp.groupBy("bs").agg(count(lit(1)).as("m"), min("doc_id").as("rep"))
      .localCheckpoint()
    val stats = byFp.agg(count(lit(1)).as("n_distinct"), max("m").as("max_mult"),
      sum(col("m") * (col("m") - 1) / 2).as("d0_pairs")).head()
    println(s"[phashprobe] dir=$dir distinct_fp=${stats.getLong(0)} max_mult=${stats.getLong(1)} d0_pairs=${stats.getAs[Any](2)}")
    val ex = byFp.select(col("rep"), col("bs"), posexplode(col("bs")).as(Seq("band", "v")))
    val a = ex.select(col("rep").as("ra"), col("bs").as("bsa"), col("band"), col("v"))
    val b = ex.select(col("rep").as("rb"), col("bs").as("bsb"), col("band"), col("v"))
    val ham = (0 until 4).map(k => expr(s"bit_count(bsa[$k] ^ bsb[$k])")).reduce(_ + _)
    val cj = a.join(b, Seq("band", "v")).filter(col("ra") < col("rb"))
    val agg = cj.agg(count(lit(1)).as("cand_occ")).head()
    println(s"[phashprobe] rep_cand_occurrences=${agg.getLong(0)}")
    val tp = cj.withColumn("h", ham).filter(col("h") <= 3)
      .select("ra", "rb").distinct().count()
    println(s"[phashprobe] rep_true_pairs_d3=$tp")
    spark.stop()
  }
}
