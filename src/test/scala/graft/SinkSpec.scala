package graft

import graft.operators.Dedup
import graft.sinks.GraftSink
import graft.streaming.DedupStream
import graft.streaming.DedupStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {

  test("date-partitioned batch sink round-trips and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    try {
      val primes = Dedup.dedupFirst(spark, sf)
      GraftSink.writeDatePartitioned(primes, dir.getAbsolutePath)
      val back = spark.read.parquet(dir.getAbsolutePath)
      assert(back.count() === primes.count())
      // partition dirs exist (one per day present in the data)
      val partDirs = dir.listFiles().filter(_.getName.startsWith("p_date="))
      assert(partDirs.nonEmpty)
      // a partition-column filter prunes at file-listing time: the
      // scan for one day must read fewer files than the full table
      val oneDay = back.select("p_date").distinct().limit(1)
        .collect()(0).getDate(0)
      val pruned = back.filter(col("p_date") === lit(oneDay))
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
        s"partition filter not pushed to scan:\n$plan")
      assert(pruned.count() > 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("bucketed tables join and aggregate with no exchange (pay the shuffle once, at write)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toFile
    try {
      val left = (0L until 500L).map(i => (i % 50, i)).toDF("k", "v")
      val right = (0L until 200L).map(i => (i % 50, i * 10)).toDF("k", "w")
      GraftSink.writeBucketed(left, "bk_left", "k", 4,
        Some(new java.io.File(dir, "l").getAbsolutePath))
      GraftSink.writeBucketed(right, "bk_right", "k", 4,
        Some(new java.io.File(dir, "r").getAbsolutePath))
      val joined = spark.table("bk_left")
        .join(spark.table("bk_right"), "k")
        // disable broadcast so the test exercises the bucketed path
        .hint("shuffle_merge")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // counts still correct: 10 left rows x 4 right rows per key
      assert(joined.count() === 50L * 10 * 4)
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("bk_left").groupBy("k").agg(sum("v"))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(agg.count() === 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("streaming dedup -> file sink forwards exactly the primes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    try {
      val base = 1700000000000L
      def ev(id: Long, tMs: Long, user: Long = 1L) =
        Ev(id, new java.sql.Timestamp(tMs), user, "x", 1.0, "{}")
      val input = MemoryStream[Ev]
      val deduped = DedupStream.dedupTtlChain(input.toDS(), ttlMs = 60000L)
      val q = GraftSink.startFileSink(deduped.toDF(), out.getAbsolutePath,
        ckpt.getAbsolutePath)
      try {
        input.addData(ev(1, base), ev(2, base + 1000), ev(3, base + 2000, user = 2))
        q.processAllAvailable()
        val got = spark.read.parquet(out.getAbsolutePath)
          .select("event_id").collect().map(_.getLong(0)).toSet
        // 1 and 2 share content -> 2 dropped; 3 is a different key
        assert(got === Set(1L, 3L))
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(out); rm(ckpt)
    }
  }

  test("compact collapses a fragmented directory without losing a row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    try {
      val frag = s"${dir.getAbsolutePath}/frag"
      val tight = s"${dir.getAbsolutePath}/tight"
      val docs = Tables.documents(spark, sf)
      docs.repartition(50).write.parquet(frag) // the streaming-sink pathology
      def parquetFiles(p: String) =
        new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
      assert(parquetFiles(frag) === 50)
      val n = GraftSink.compact(spark, frag, tight)
      assert(parquetFiles(tight) === n && n <= 2, s"still $n files")
      // exact content preservation (multiset equality via full outer)
      val a = spark.read.parquet(frag).groupBy("doc_id").count()
      val b = spark.read.parquet(tight).groupBy("doc_id").count()
      assert(a.join(b, Seq("doc_id"), "full_outer").filter(
        a("count") =!= b("count") || a("count").isNull || b("count").isNull
      ).count() === 0)
      assert(spark.read.parquet(tight).count() === docs.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }
}
