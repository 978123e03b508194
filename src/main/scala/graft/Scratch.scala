package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"TIMER $name = ${(System.nanoTime()-t0)/1e9}")
    }
    time("jaccard") {
      operators.NearDup.jaccardPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("minhash") {
      operators.NearDup.minhashLshPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("simhash") {
      operators.NearDup.simhashPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
