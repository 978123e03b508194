package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation A/B harness: MANUAL salting (the q_salted_join
  * pattern) vs Spark's built-in AQE skew-join split vs the unmitigated
  * straggler baseline, on a deliberately skewed equi-join over the
  * driver's events table. The engine ships BOTH mitigations; this
  * measures when the built-in one suffices so the 100 TB design can
  * say so with numbers instead of folklore (SURVEY §5 carries the
  * conclusion, BASELINE.md the artifact).
  *
  * Setup: the fact side collapses half its rows onto ONE key
  * (user_id % 10 < 5 → key 0) and is amplified `SPARK_GRAFT_SKEW_AMP`×
  * by a bounded explode, so at sf1 the hot key holds ~10M of ~20M
  * rows — a 16× straggler at 32 shuffle partitions if nothing
  * intervenes. The dim side is the distinct key set; broadcast is
  * DISABLED (autoBroadcastJoinThreshold=-1) because the regime where
  * skew mitigation matters at all is a shuffled join — a broadcast
  * join has no reduce-side hot partition to split (that IS the first
  * mitigation, and the contract queries already declare it).
  *
  * AQE's skew thresholds are scaled down with the data
  * (skewedPartitionThresholdInBytes 4m / advisory 2m vs the 256m/64m
  * defaults, same ratio at ~1/50 the partition bytes of a production
  * shuffle) and applied IDENTICALLY across variants so only the
  * mitigation differs. Every variant's (chk, n) aggregate — an
  * exact-integer checksum, summation-order-independent — is asserted
  * equal across variants before any artifact is written; a
  * mismatching mitigation exits nonzero instead of producing a
  * plausible-looking A/B row.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val amp = sys.env.get("SPARK_GRAFT_SKEW_AMP").map(_.toInt).getOrElse(20)
    val salts = sys.env.get("SPARK_GRAFT_SKEW_SALTS").map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fact: DataFrame = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"))
      .withColumn("m", explode(sequence(lit(1), lit(amp))))
      .withColumn("k",
        when(pmod(col("user_id"), lit(10L)) < 5, lit(0L)).otherwise(col("user_id")))
      .select(col("k"), col("value"), col("m"))
    def dim: DataFrame = Tables.events(spark, sfDir)
      .select(when(pmod(col("user_id"), lit(10L)) < 5, lit(0L))
        .otherwise(col("user_id")).as("k"))
      .distinct()
      .withColumn("payload", pmod(col("k"), lit(97L)))

    // exact-integer checksum: per-row cents × integer payload summed
    // as BIGINT — summation-order-independent, so the cross-variant
    // result assert below is EXACT (a float sum can differ in ulps
    // across partitionings and would make the check flaky)
    def chkAgg(df: DataFrame): DataFrame =
      df.agg(sum(expr("CAST(round(value * 100) AS BIGINT)") * col("payload")).as("chk"),
        count(lit(1)).as("n"))

    def plainJoin: DataFrame = chkAgg(fact.join(dim, "k"))

    // The ELIGIBILITY variant: OptimizeSkewedJoin only matches a join
    // whose children are Sort-over-bare-ShuffleQueryStage. In
    // plainJoin the dim's distinct aggregate FUSES between its
    // shuffle and the join (the join reuses the agg's k-partitioning,
    // no new exchange), so the built-in split is structurally blocked
    // — measured as the skew_split_fired=false row. Detaching the dim
    // behind a lazy localCheckpoint forces a fresh ENSURE_REQUIREMENTS
    // exchange under the join, making the stage shape eligible.
    def plainJoinDetachedDim: DataFrame =
      chkAgg(fact.join(dim.localCheckpoint(eager = false), "k"))

    def saltedJoin: DataFrame = {
      // deterministic per-row salt from the row's own identity
      val salted = fact.withColumn("_salt",
        pmod(xxhash64(col("k"), col("m"), col("value")), lit(salts.toLong)))
      val dimX = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
      chkAgg(salted.join(dimX, Seq("k", "_salt")))
    }

    // min over reps: isolates plan cost from box-contention noise
    // (straggler vs split differences are multiples, not percents —
    // the min is the honest per-plan floor)
    val reps = sys.env.get("SPARK_GRAFT_SKEW_REPS").map(_.toInt).getOrElse(3)
    def run(tag: String, skewJoinOn: Boolean, df: => DataFrame): (Double, String, (Long, Long)) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinOn.toString)
      val timed = (1 to reps).map { _ =>
        val frame = df
        val t0 = System.nanoTime()
        // the 1-row collect IS full execution of the join + aggregate,
        // and doubles as the cross-variant result check
        val r = frame.collect().head
        val secs = (System.nanoTime() - t0) / 1e9
        // did AQE's split actually fire? the final adaptive plan tags
        // split partitions with "skew=true"
        val fired = frame.queryExecution.executedPlan.toString.contains("skew=true")
        (secs, fired, r)
      }
      val (secs, skewFired, r) = timed.minBy(_._1)
      System.err.println(s"[skew] $tag chk=${r.get(0)} n=${r.get(1)} secs=$secs skewFired=$skewFired all=${timed.map(t => f"${t._1}%.2f").mkString(",")}")
      (secs, s""""$tag":{"secs":$secs,"skew_split_fired":$skewFired}""", (r.getLong(0), r.getLong(1)))
    }

    // warmup: table scan + codegen
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()

    val results = Seq(
      run("plain_no_mitigation", skewJoinOn = false, plainJoin),
      run("plain_aqe_skewjoin", skewJoinOn = true, plainJoin),
      run("plain_aqe_detached_dim", skewJoinOn = true, plainJoinDetachedDim),
      run("salted_manual", skewJoinOn = false, saltedJoin),
      // both ON: does the salt mislead or compose with AQE?
      run("salted_with_aqe", skewJoinOn = true, saltedJoin))

    // every mitigation variant must compute the SAME join result — a
    // salting bug dropping rows would otherwise still emit a
    // plausible timing artifact; the exact-integer chk makes this an
    // equality, not a tolerance
    val checks = results.map(_._3).distinct
    if (checks.length > 1) {
      System.err.println(s"[skew] RESULT MISMATCH across variants: (chk, n) = ${checks.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }

    val json =
      s"""{"metric":"skew_ab","sf":"$sfDir","amp":$amp,"salts":$salts,"seconds":{${results.map(_._2).mkString(",")}}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_SKEW_OUT", "/tmp/skew_ab.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[skew] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
