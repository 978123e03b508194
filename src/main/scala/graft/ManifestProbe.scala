package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manifest-MAINTENANCE A/B probe (round-13, VERDICT r12 #6): the
  * production N+1 near-dup loop appends each accepted batch's LSH
  * band keys to the persisted manifest
  * ([[graft.operators.NearDup.writeBandManifest]] append = true);
  * this main times that append against the full-history rebuild the
  * contract query pays, plus the probe itself, on one corpus split
  * (history = doc_id % 5 ∈ {2,3,4}, batch₁ = % 5 = 1, batch₂ = % 5
  * = 0 — the Round13Spec fixture at scale).
  *
  * Usage: runMain graft.ManifestProbe <sfDir>
  * Env: SPARK_GRAFT_CPUS / _SHUFFLE_PARTITIONS as in Bench.
  * Output: one JSON line (build_sec for the initial history write,
  * append_sec for batch₁'s key append, rebuild_sec for the
  * from-scratch history∪batch₁ control, probe_sec for batch₂'s
  * verified probe against the maintained manifest, pair count so
  * the probe fully executes).
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.NearDup

    // deliberately NOT checkpointed: materializing the full shingled
    // corpus into the MemoryStore OOMs at sf100 (10 M deserialized
    // shingle rows); re-shingling per consumer is a cheap map pass
    val sliced = NearDup.shingledDocs(Tables.documents(spark, dir))
    val h = sliced.filter(pmod(col("doc_id"), lit(5L)).isin(2L, 3L, 4L))
    val b1 = sliced.filter(pmod(col("doc_id"), lit(5L)) === 1L)
    val b2 = sliced.filter(pmod(col("doc_id"), lit(5L)) === 0L)
    def timed(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val tMaint = "graft_probe_manifest_maint"
    val tRebuild = "graft_probe_manifest_rebuild"
    // a crashed prior run can leave the warehouse DIRECTORY behind
    // with no catalog entry (in-memory metastore dies with the JVM;
    // the location does not) — clear both before creating
    Seq(tMaint, tRebuild).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    try {
      val tBuild = timed(
        NearDup.writeBandManifest(spark, NearDup.bandManifestKeys(h), tMaint))
      val tAppend = timed(
        NearDup.writeBandManifest(spark, NearDup.bandManifestKeys(b1), tMaint,
          append = true))
      val tRebuildS = timed(
        NearDup.writeBandManifest(spark,
          NearDup.bandManifestKeys(h.unionByName(b1)), tRebuild))
      var nPairs = -1L
      val tProbe = timed {
        nPairs = NearDup.neardupAgainstManifest(spark, b2, tMaint, sliced).count()
      }
      val json = f"""{"manifest_probe":{"dir":"$dir","build_sec":$tBuild%.1f,"append_sec":$tAppend%.1f,"rebuild_sec":$tRebuildS%.1f,"probe_sec":$tProbe%.1f,"n_pairs":$nPairs}}"""
      println(json)
      val out = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_OUT", "/tmp/manifest_probe.json")
      try java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[manifestprobe] ${e.getMessage}") }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tMaint")
      spark.sql(s"DROP TABLE IF EXISTS $tRebuild")
      spark.stop()
    }
  }
}
