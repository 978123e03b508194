package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic A/B for the semantic-dedup quantizer's balance levers
  * (the round-8 sf10 movement finding: with corpus-derived K but the
  * default one-pass Lloyd, cluster imbalance on a structured corpus
  * still inflates in-cluster pair mass past linear). For each
  * (clusters, iters) variant it measures the verified-pair count,
  * wall seconds, and the settled shuffle-write bytes of
  * `Ann.embSemanticPairs` — the pair-generation stage that carries
  * the Σn_k² cost.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt 'runMain graft.SemDedupProbe'
  *
  * Variants: auto-K/iters=1 (the shipped default), auto-K/iters=2
  * (one more Lloyd pass), 2·auto-K/iters=1 (halved target cluster
  * size). Prints one JSON line per variant.
  *
  * `routed` mode (arg 1) instead A/Bs the FLAT n·K assignment
  * against the two-level routed one
  * ([[graft.operators.Ann.embSemanticPairsRouted]], sample-trained
  * centroids, gprobe=2) — the past-sf10 lever BASELINE round-9
  * measures. Flat is skipped unless SPARK_GRAFT_SEM_FLAT=1 (at sf100
  * the flat assignment is the multi-hour cost the routed path
  * exists to remove).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "balance"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = Tables.embeddings(spark, sfDir).count()
    val autoK = graft.operators.Ann.clustersFor(n)
    val mv = new MovementMeter
    spark.sparkContext.addSparkListener(mv)

    if (mode == "routed") {
      def run(tag: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
        val before = mv.settled._2
        val t0 = System.nanoTime()
        val cnt = pairs.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val bytes = mv.settled._2 - before
        println(f"""{"probe":"$tag","n":$n,"k":$autoK,"pairs":$cnt,"secs":$secs%.1f,"shuffle_write_mb":${bytes / 1048576.0}%.1f}""")
      }
      run("routed_g2_sampled", graft.operators.Ann.embSemanticPairsRouted(
        spark, sfDir, gprobe = 2, trainSampleTarget = 131072L))
      if (sys.env.get("SPARK_GRAFT_SEM_FLAT").contains("1"))
        run("flat", graft.operators.Ann.embSemanticPairs(spark, sfDir))
      spark.stop()
      return
    }

    val variants = Seq(
      ("autoK_iters1", autoK, 1),
      ("autoK_iters2", autoK, 2),
      ("2K_iters1", 2 * autoK, 1))
    variants.foreach { case (tag, k, iters) =>
      import org.apache.spark.sql.functions._
      val e = graft.operators.Ann.semanticFrame(spark, sfDir)
      // cluster-balance profile: Σn_k² IS the candidate-pair mass
      val sizes = graft.operators.Ann.semanticAssignments(e, k, iters, 1)
        .groupBy("cid").agg(count(lit(1)).as("nk"))
        .agg(count(lit(1)).as("cells"), max("nk").as("max_nk"),
          sum(col("nk") * col("nk")).as("sum_nk2")).collect().head
      val before = mv.settled._2
      val t0 = System.nanoTime()
      val pairs = graft.operators.Ann
        .embSemanticPairs(spark, sfDir, clusters = k, iters = iters).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = mv.settled._2 - before
      println(f"""{"probe":"$tag","n":$n,"k":$k,"iters":$iters,"cells":${sizes.getLong(0)},"max_nk":${sizes.getLong(1)},"sum_nk2":${sizes.getLong(2)},"pairs":$pairs,"secs":$secs%.1f,"shuffle_write_mb":${bytes / 1048576.0}%.1f}""")
    }
    spark.stop()
  }
}
