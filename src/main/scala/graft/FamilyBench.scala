package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench for the dedup audit-family seam: times the three
  * audit queries (docs_detector_venn, docs_group_sizes,
  * docs_dedup_keep) first as independent plans (the one-query-one-
  * plan driver contract), then through
  * [[graft.operators.NearDup.dedupAuditFamily]]'s shared pair-set
  * seam. Prints one JSON line with both totals.
  *
  * Usage: runMain graft.FamilyBench [sfDir]
  */
object FamilyBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.NearDup

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT + OS page cache so the comparison is plan-shaped,
    // not first-touch-shaped
    NearDup.docsDetectorVenn(spark, dir).count()

    val tSeparate = time {
      NearDup.docsDetectorVenn(spark, dir).count()
      NearDup.docsGroupSizes(spark, dir).count()
      NearDup.dedupKeep(spark, dir).count()
    }
    val tSeam = time {
      val (venn, sizes, keep) = NearDup.dedupAuditFamily(spark, dir)
      venn.count(); sizes.count(); keep.count()
    }
    println(f"""{"family_separate_sec":$tSeparate%.2f,"family_seam_sec":$tSeam%.2f,"sf_dir":"$dir"}""")
    spark.stop()
  }
}
