package graft

import graft.streaming.DedupStream
import graft.streaming.DedupStream.Ev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming throughput benchmark (VERDICT r8 item #6): the reference
  * is a streaming dedup service — `Deduplicator.handleMessage` is its
  * hot path — so the streaming legs need a measured rows/s and
  * state-size artifact next to their correctness specs, not instead
  * of one.
  *
  * Drives the three dedup legs over the SAME generated event stream:
  *
  *  - `dedupTtlChain`     — flatMapGroupsWithState, default store;
  *  - `dedupTtlChainTws`  — transformWithState on RocksDB (the API +
  *                          store the 100 TB deployment runs);
  *  - `dedupBounded`      — the maximumSize-analog slot cache.
  *
  * Traffic profile mirrors the hfp-5000 feed shape: K distinct
  * content keys (~5000 vehicles), duplicate/prime ratio ~1.0 (the
  * reference alerts ABOVE 1.0 — "more duplicates than primes means
  * something's wrong", Analytics.java:48-52), duplicates trailing
  * their prime by seconds, and anchor churn every cacheTTL (4 h
  * event-time stride per cycle) so timers actually evict. Events are
  * fed through MemoryStream in `batches` micro-batches in event-time
  * order; per-batch wall times come from our own clock around
  * `processAllAvailable` (includes all micro-batch overhead — the
  * honest per-trigger number), state rows/bytes from the final
  * StreamingQueryProgress.
  *
  * Env knobs: SPARK_GRAFT_STREAM_EVENTS (default 1_000_000),
  * SPARK_GRAFT_STREAM_BATCHES (20), SPARK_GRAFT_STREAM_KEYS (5000),
  * SPARK_GRAFT_CPUS (32). Output: one JSON line (also written to
  * SPARK_GRAFT_STREAM_OUT, default /tmp/stream_bench.json).
  */
object StreamBench {
  private val TtlMs = 4L * 3600 * 1000 // reference cacheTTL = 4 hours

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "1000000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "5000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // hfp-like stream: per key per cycle, one prime + one duplicate
    // 1 s later + (every 4th cycle) a long-range duplicate at
    // prime + ttl/2 — suppressed off an anchor written cycles of
    // micro-batches earlier, so the state READ path is exercised, not
    // just same-batch chains. Cycle stride > ttl ⇒ next cycle's
    // arrival is a fresh prime (anchor replacement + timer churn).
    val base = 1700000000000L
    val stride = TtlMs + 60000L
    val perCycle = nKeys * 2
    val cycles = math.max(1, nEvents / perCycle)
    def cycleEvents(c: Int): Seq[Ev] = {
      val t0 = base + c.toLong * stride
      val evs = Seq.newBuilder[Ev]
      var k = 0
      while (k < nKeys) {
        val id = (c.toLong * perCycle + 2L * k)
        val tp = t0 + (k % 997) // spread primes inside the cycle
        evs += Ev(id, new java.sql.Timestamp(tp), k.toLong, "vp", 1.0, "{}")
        val dupTs = if (c % 4 == 3) tp + TtlMs / 2 else tp + 1000L
        evs += Ev(id + 1, new java.sql.Timestamp(dupTs), k.toLong, "vp", 1.0, "{}")
        k += 1
      }
      evs.result().sortBy(e => (e.ts.getTime, e.event_id))
    }
    val all = (0 until cycles).flatMap(cycleEvents)
    // +37 keeps micro-batch boundaries MISALIGNED with cycle
    // boundaries, so dup chains regularly straddle batches and the
    // cross-batch state-read path is part of what's measured
    val batchSize = math.max(1, all.size / nBatches + 37)
    val batches = all.grouped(batchSize).toSeq

    case class LegResult(rowsIn: Long, rowsOut: Long, totalSec: Double,
                         batchMs: Seq[Double], stateRows: Long, stateBytes: Long)

    def runLeg(name: String, provider: Option[String])
              (mk: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[Ev]): LegResult = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val input = MemoryStream[Ev]
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft_sb_$name").toString
        val q = mk(input.toDS()).writeStream.format("memory")
          .queryName(s"sb_$name").outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt).start()
        try {
          val times = batches.map { b =>
            val t0 = System.nanoTime()
            input.addData(b)
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e6
          }
          val rowsOut = spark.table(s"sb_$name").count()
          val so = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators.toSeq).headOption
          LegResult(all.size.toLong, rowsOut, times.sum / 1000.0, times,
            so.map(_.numRowsTotal).getOrElse(-1L),
            so.map(_.memoryUsedBytes).getOrElse(-1L))
        } finally q.stop()
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => if (provider.isDefined) spark.conf.unset(key)
      }
    }

    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val legs = Seq(
      ("ttl_chain_fmgws", runLeg("fmgws", None)(
        ds => DedupStream.dedupTtlChain(ds, TtlMs))),
      ("ttl_chain_tws_rocksdb", runLeg("tws", Some(rocks))(
        ds => DedupStream.dedupTtlChainTws(ds, TtlMs))),
      ("bounded_slots", runLeg("bounded", None)(
        ds => DedupStream.dedupBounded(ds, TtlMs, 250000))))

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    val legJson = legs.map { case (name, r) =>
      val sorted = r.batchMs.sorted
      val p50 = sorted(sorted.size / 2)
      s""""$name":{"rows_in":${r.rowsIn},"rows_out":${r.rowsOut},"total_sec":${fmt(r.totalSec)},"rows_per_sec":${fmt(r.rowsIn / r.totalSec)},"batch_ms_p50":${fmt(p50)},"batch_ms_max":${fmt(sorted.last)},"state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    }.mkString(",")
    val json =
      s"""{"stream_bench":{"events":$nEvents,"batches":${batches.size},"keys":$nKeys,"dup_ratio":1.0,"ttl_ms":$TtlMs,$legJson}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "/tmp/stream_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[streambench] $out: ${e.getMessage}") }
    spark.stop()
  }
}
