package graft

import org.apache.spark.sql.SparkSession

/** kNN-graph BUILD A/B probe (VERDICT r9 #3): times the exact
  * (rate·n)² block-matrix build against the cell-routed build
  * ([[graft.operators.Ann.embKnnGraphCells]]) on the same sample,
  * optionally with the build-recall monitor (which itself pays the
  * exact build — run recall at the decade where exact is affordable,
  * time routed alone at the decade where it is not).
  *
  * Usage: runMain graft.GraphBuildProbe <sfDir> <mode>
  *   mode ∈ exact | routed | recall | recall_s | nav_s | both |
  *          rank | rank_exact | labelprop
  *   (`rank` = the [[graft.operators.Ann.embGraphRankOn]] loop fed
  *   by the ROUTED build — the scale rendering of emb_graph_rank;
  *   `rank_exact` = the contract rendering, for the same-box ratio;
  *   `recall_s` = the sampled BUILD-recall monitor, linear at any
  *   decade; `nav_s` = the sampled NAVIGATION monitor
  *   (ann_recall_graph_s) with SPARK_GRAFT_GRAPH_SEED ∈ multi
  *   (default) | single — the round-13 seeding A/B;
  *   `labelprop` = [[graft.operators.Ann.labelPropOn]] fed by the
  *   ROUTED build — the scale rendering of emb_knn_label_prop)
  * Env: SPARK_GRAFT_GRAPH_RATE (0.1), _K (3), _NPROBE (2),
  *      _GPROBE (2), _CLUSTERS (0 = auto-K), _TRAIN (131072),
  *      _NQ (32, recall_s query-node count),
  *      SPARK_GRAFT_CPUS / _SHUFFLE_PARTITIONS as in Bench.
  * Output: one JSON line (edges counted so the build fully executes).
  */
object GraphBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("both")
    val knownModes = Set("exact", "routed", "recall", "recall_s", "nav_s",
      "both", "rank", "rank_exact", "labelprop")
    if (!knownModes(mode)) {
      // fail loudly: a typo'd mode would otherwise write a probe JSON
      // with no measurement fields and read as a silent success
      System.err.println(
        s"[graph-probe] unknown mode '$mode' — expected one of ${knownModes.toSeq.sorted.mkString("|")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ann

    def env(k: String, d: String): String = sys.env.getOrElse(k, d)
    val rate = env("SPARK_GRAFT_GRAPH_RATE", "0.1").toDouble
    val k = env("SPARK_GRAFT_GRAPH_K", "3").toInt
    val nprobe = env("SPARK_GRAFT_GRAPH_NPROBE", "2").toInt
    val gprobe = env("SPARK_GRAFT_GRAPH_GPROBE", "2").toInt
    val clusters = env("SPARK_GRAFT_GRAPH_CLUSTERS", "0").toInt
    val train = env("SPARK_GRAFT_GRAPH_TRAIN", "131072").toLong

    def timed(f: => Long): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val parts = Seq.newBuilder[String]
    if (mode == "exact" || mode == "both") {
      val (t, n) = timed(Ann.embKnnGraph(spark, dir, k, rate).count())
      parts += f""""exact_sec":$t%.1f,"exact_edges":$n"""
    }
    if (mode == "routed" || mode == "both") {
      val (t, n) = timed(Ann.embKnnGraphCells(spark, dir, k, rate,
        clusters, iters = 1, nprobe, gprobe, train).count())
      parts += f""""routed_sec":$t%.1f,"routed_edges":$n"""
    }
    if (mode == "rank") {
      import org.apache.spark.sql.functions.col
      val (t, n) = timed(Ann.embGraphRankOn(
        Ann.embKnnGraphCells(spark, dir, k, rate,
          clusters, iters = 1, nprobe, gprobe, train)
          .select(col("vec_id").as("src"), col("n_id").as("dst")),
        k).count())
      parts += f""""rank_routed_sec":$t%.1f,"rank_routed_nodes":$n"""
    }
    if (mode == "labelprop") {
      // label propagation fed by the ROUTED build — the linear scale
      // rendering of emb_knn_label_prop (contract feeds the exact
      // build and shares emb_knn_graph's dispositioned wall)
      import org.apache.spark.sql.functions.{col, pmod, lit, when}
      import graft.operators.Sampling
      val edges = Ann.embKnnGraphCells(spark, dir, k, rate,
          clusters, iters = 1, nprobe, gprobe, train)
        .select(col("vec_id").as("src"), col("n_id").as("dst"))
      val seeds = Tables.embeddings(spark, dir)
        .filter(Sampling.hash32(col("vec_id")) < Sampling.rateThreshold(rate))
        .select(col("vec_id"),
          when(pmod(col("vec_id"), lit(5L)) === 0, col("label").cast("long")).as("label"))
      val (t, n) = timed(Ann.labelPropOn(edges, seeds).count())
      parts += f""""labelprop_routed_sec":$t%.1f,"labelprop_nodes":$n"""
    }
    if (mode == "rank_exact") {
      val (t, n) = timed(Ann.embGraphRank(spark, dir, k).count())
      parts += f""""rank_exact_sec":$t%.1f,"rank_exact_nodes":$n"""
    }
    if (mode == "recall") {
      val (t, _) = timed(1L)
      val row = Ann.embKnnGraphRecall(spark, dir, k, rate,
        clusters, iters = 1, nprobe, gprobe, train).head()
      parts += s""""n_exact":${row.getAs[Long]("n_exact")},"n_hit":${row.getAs[Long]("n_hit")},"recall":${row.getAs[Double]("recall")}"""
      val _ = t
    }
    if (mode == "recall_s") {
      // the round-12 SAMPLED monitor: linear wall at any decade
      // (exact side = nQ query nodes only); timed, since cheap enough
      // to run where the full monitor is not
      val nQ = env("SPARK_GRAFT_GRAPH_NQ", "32").toInt
      System.gc()
      val t0 = System.nanoTime()
      val row = Ann.embKnnGraphRecallSampled(spark, dir, k, rate, nQ,
        clusters, iters = 1, nprobe, gprobe, train).head()
      val t = (System.nanoTime() - t0) / 1e9
      parts += f""""recall_s_sec":$t%.1f,"nq":$nQ,"n_exact":${row.getAs[Long]("n_exact")},"n_hit":${row.getAs[Long]("n_hit")},"recall":${row.getAs[Double]("recall")}"""
    }
    if (mode == "nav_s") {
      // the sampled NAVIGATION monitor (ann_recall_graph_s) — the
      // round-13 seeding A/B: SPARK_GRAFT_GRAPH_SEED=single replays
      // the legacy one-global-entry beam, =multi (default) the
      // per-query probed-cell entry roster; identical beam budget,
      // so the recall delta isolates the seeding change
      import org.apache.spark.sql.functions.{avg, count, lit, sum}
      val nQ = env("SPARK_GRAFT_GRAPH_NQ", "32").toInt
      val seedMode = env("SPARK_GRAFT_GRAPH_SEED", "multi")
      System.gc()
      val t0 = System.nanoTime()
      val row = Ann.annRecallGraphSampled(spark, dir, nQ, rate = rate,
          clusters = clusters, nprobe = nprobe, gprobe = gprobe,
          trainSampleTarget = train, multiEntry = seedMode != "single")
        .agg(count(lit(1)).as("nq"), sum("n_match").as("n_hit"),
          avg("recall").as("recall")).head()
      val t = (System.nanoTime() - t0) / 1e9
      parts += f""""nav_s_sec":$t%.1f,"seed":"$seedMode","nq":${row.getAs[Long]("nq")},"n_hit":${row.getAs[Long]("n_hit")},"mean_recall":${row.getAs[Double]("recall")}%.4f"""
    }
    val json = s"""{"graph_probe":{"dir":"$dir","rate":$rate,"k":$k,"nprobe":$nprobe,"gprobe":$gprobe,"clusters":$clusters,"train":$train,${parts.result().mkString(",")}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_GRAPH_OUT", "/tmp/graph_probe.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[graphprobe] ${e.getMessage}") }
    spark.stop()
  }
}
