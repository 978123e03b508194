package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level wall profiler for one or more contract queries:
  * `runMain graft.JobProbe <query ...>` runs each query twice (rep 1
  * cold, rep 2 warm) through the Bench noop-sink methodology and
  * prints every Spark job's wall seconds plus the DRIVER GAP since
  * the previous job ended (planning/analysis/collect time lives in
  * the gaps — at the bench SFs the gaps routinely outweigh the
  * jobs). Measurement tool only; no query semantics.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.present.detach", "true")

    case class J(id: Int, start: Long, var end: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val stage = j.stageInfos.sortBy(_.stageId).lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
        jobs.put(j.jobId, J(j.jobId, j.time, -1L, stage))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    })

    for (name <- args.toSeq) {
      for (rep <- 1 to 2) {
        jobs.clear()
        System.gc()
        val t0 = System.currentTimeMillis()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.currentTimeMillis() - t0) / 1000.0
        Thread.sleep(300) // let listener events drain
        println(f"%n== $name rep$rep wall=$wall%.2f s, jobs=${jobs.size}")
        var prevEnd = t0
        jobs.values().toArray(Array.empty[J]).sortBy(_.start).foreach { j =>
          val gap = (j.start - prevEnd) / 1000.0
          val dur = if (j.end < 0) -1.0 else (j.end - j.start) / 1000.0
          println(f"  gap=$gap%6.2f job=${j.id}%3d dur=$dur%6.2f  ${j.desc.take(110)}")
          prevEnd = math.max(prevEnd, if (j.end < 0) j.start else j.end)
        }
        println(f"  tail-gap=${(t0 + (wall * 1000).toLong - prevEnd) / 1000.0}%6.2f")
      }
    }
    spark.stop()
  }
}
