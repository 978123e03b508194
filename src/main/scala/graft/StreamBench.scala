package graft

import graft.streaming.{DedupStream, NearDupStream}
import graft.streaming.DedupStream.Ev
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming throughput benchmark (VERDICT r8 item #6, widened in
  * r10 per VERDICT r9 #5): the reference is a streaming dedup
  * service — `Deduplicator.handleMessage` is its hot path — so the
  * streaming legs need a measured rows/s and state-size artifact
  * next to their correctness specs, not instead of one.
  *
  * Dedup legs over the SAME generated event stream:
  *
  *  - `ttl_chain_fmgws`    — flatMapGroupsWithState, default store;
  *  - `ttl_chain_tws_rocksdb` — transformWithState on RocksDB (the
  *                          API + store the 100 TB deployment runs);
  *  - `ttl_chain_tws_rocksdb_changelog` — same, with CHANGELOG
  *                          checkpointing (per-batch delta upload
  *                          instead of full snapshot sync — the knob
  *                          the r9 verdict asked to A/B as a
  *                          fixed-overhead suspect);
  *  - `bounded_slots`      — the maximumSize-analog slot cache.
  *
  * Near-dup-on-arrival legs (r10) over generated fingerprint/
  * signature streams with ~10% planted near-dups:
  *
  *  - `simhash_candidates` — banded-Hamming bucket state
  *    ([[NearDupStream.simhashCandidates]], 20 Manku combos/doc);
  *  - `minhash_candidates` — LSH band-bucket state
  *    ([[NearDupStream.minhashCandidates]], 32 bands over 128-long
  *    signatures — the input stream carries the 1 KB sig payload,
  *    which is the honest ingest shape).
  *
  * Traffic profile of the dedup legs mirrors the hfp-5000 feed
  * shape: K distinct content keys (~5000 vehicles), duplicate/prime
  * ratio ~1.0 (the reference alerts ABOVE 1.0 — "more duplicates
  * than primes means something's wrong", Analytics.java:48-52),
  * duplicates trailing their prime by seconds, and anchor churn
  * every cacheTTL (4 h event-time stride per cycle) so timers
  * actually evict. Events are fed through MemoryStream in `batches`
  * micro-batches in event-time order; per-batch wall times come from
  * our own clock around `processAllAvailable` (includes all
  * micro-batch overhead — the honest per-trigger number), state
  * rows/bytes from the final StreamingQueryProgress, and the
  * per-batch DURATION BREAKDOWN (addBatch / stateCommit /
  * queryPlanning / walCommit / ...) is averaged from recentProgress
  * over data-carrying batches — the "where do the ~2.2 s/batch go"
  * instrumentation.
  *
  * Env knobs: SPARK_GRAFT_STREAM_EVENTS (default 1_000_000),
  * SPARK_GRAFT_STREAM_BATCHES (20), SPARK_GRAFT_STREAM_KEYS (5000),
  * SPARK_GRAFT_STREAM_DOCS (50_000 — the near-dup legs),
  * SPARK_GRAFT_STREAM_LEGS (comma subset), SPARK_GRAFT_CPUS (32).
  * Output: one JSON line (also written to SPARK_GRAFT_STREAM_OUT,
  * default /tmp/stream_bench.json).
  */
object StreamBench {
  private val TtlMs = 4L * 3600 * 1000 // reference cacheTTL = 4 hours

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "1000000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "5000").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_STREAM_DOCS", "50000").toInt
    val legFilter = sys.env.get("SPARK_GRAFT_STREAM_LEGS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
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

    // Constant-plan box-speed probe — the Bench normalizer block
    // (VERDICT r10 #6): median of 3 runs of the two stable
    // scan-shaped batch queries over a FIXED sf dir, so cross-round
    // streaming throughputs divide out box speed instead of guessing
    // (BASELINE round-10 could not separate bounded_slots 32.4k vs
    // 10.4k rows/s from box noise). One warm run precedes the timed
    // three; probe failures degrade to {} rather than kill the bench.
    val probeDir = sys.env.getOrElse("SPARK_GRAFT_STREAM_PROBE_DIR",
      "/root/testdata/sf0.1")
    val probeJson = try {
      def run1(name: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, probeDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Seq("q1_agg", "q6_filter").map { n =>
        run1(n) // warm
        val ts = Seq.fill(3)(run1(n)).sorted
        "\"" + n + "\":" +
          String.format(java.util.Locale.ROOT, "%.2f", Double.box(ts(1)))
      }.mkString("{", ",", "}")
    } catch { case e: Throwable =>
      System.err.println(s"[streambench] probe skipped: ${e.getMessage}")
      "{}"
    }

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
    lazy val all = (0 until cycles).flatMap(cycleEvents)
    // +37 keeps micro-batch boundaries MISALIGNED with cycle
    // boundaries, so dup chains regularly straddle batches and the
    // cross-batch state-read path is part of what's measured
    def split[T](xs: Seq[T]): Seq[Seq[T]] =
      xs.grouped(math.max(1, xs.size / nBatches + 37)).toSeq
    lazy val evBatches = split(all)

    // near-dup ingest traffic: splitmix64 fingerprints; every 10th
    // doc is a near-dup of its predecessor (simhash: ≤2 bits
    // flipped; minhash: identical signature) so candidate emission
    // and the bucket-state read path both run
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    lazy val simDocs: Seq[(Long, Long)] = (0L until nDocs.toLong).map { i =>
      if (i % 10 == 9) {
        val basefp = mix(i - 1)
        (i, basefp ^ (1L << (mix(i) & 63)) ^ (1L << ((mix(i) >>> 8) & 63)))
      } else (i, mix(i))
    }
    lazy val sigDocs: Seq[(Long, Array[Long])] = (0L until nDocs.toLong).map { i =>
      val src = if (i % 10 == 9) i - 1 else i
      (i, Array.tabulate(128)(p => mix(src * 131L + p)))
    }

    case class LegResult(rowsIn: Long, rowsOut: Long, totalSec: Double,
                         batchMs: Seq[Double], stateRows: Long, stateBytes: Long,
                         durations: Map[String, Double])

    def runLeg[T: Encoder, O](name: String, confs: Map[String, String],
                              data: Seq[Seq[T]])
                             (mk: Dataset[T] => Dataset[O]): LegResult = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val input = MemoryStream[T]
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft_sb_$name").toString
        val q = mk(input.toDS()).writeStream.format("memory")
          .queryName(s"sb_$name").outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt).start()
        try {
          val times = data.map { b =>
            val t0 = System.nanoTime()
            input.addData(b)
            q.processAllAvailable()
            (System.nanoTime() - t0) / 1e6
          }
          val rowsOut = spark.table(s"sb_$name").count()
          val so = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators.toSeq).headOption
          // mean per-duration-phase ms over the data-carrying batches
          // (processAllAvailable can append a no-data trigger whose
          // near-zero durations would dilute the breakdown)
          val progs = q.recentProgress.filter(_.numInputRows > 0)
          val durations =
            if (progs.isEmpty) Map.empty[String, Double]
            else {
              import scala.jdk.CollectionConverters._
              progs.flatMap(_.durationMs.asScala.toSeq)
                .groupBy(_._1)
                .map { case (k, vs) =>
                  k -> vs.map(_._2.toDouble).sum / progs.length }
            }
          LegResult(data.map(_.size.toLong).sum, rowsOut, times.sum / 1000.0,
            times, so.map(_.numRowsTotal).getOrElse(-1L),
            so.map(_.memoryUsedBytes).getOrElse(-1L), durations)
        } finally q.stop()
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val legDefs: Seq[(String, () => LegResult)] = Seq(
      ("ttl_chain_fmgws", () => runLeg("fmgws", Map.empty, evBatches)(
        ds => DedupStream.dedupTtlChain(ds, TtlMs))),
      ("ttl_chain_tws_rocksdb", () => runLeg("tws",
        Map(providerKey -> rocks), evBatches)(
        ds => DedupStream.dedupTtlChainTws(ds, TtlMs))),
      ("ttl_chain_tws_rocksdb_changelog", () => runLeg("twscl",
        Map(providerKey -> rocks, changelogKey -> "true"), evBatches)(
        ds => DedupStream.dedupTtlChainTws(ds, TtlMs))),
      ("bounded_slots", () => runLeg("bounded", Map.empty, evBatches)(
        ds => DedupStream.dedupBounded(ds, TtlMs, 250000))),
      ("simhash_candidates", () => runLeg("simc", Map.empty, split(simDocs))(
        ds => NearDupStream.simhashCandidates(
          ds.toDF("doc_id", "simhash")))),
      ("minhash_candidates", () => runLeg("minc", Map.empty, split(sigDocs))(
        ds => NearDupStream.minhashCandidates(
          ds.toDF("doc_id", "sig")))))
    val legs = legDefs
      .filter { case (n, _) => legFilter.forall(_.contains(n)) }
      .map { case (n, f) => (n, f()) }

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    val legJson = legs.map { case (name, r) =>
      val sorted = r.batchMs.sorted
      val p50 = sorted(sorted.size / 2)
      val durJson = r.durations.toSeq.sortBy(-_._2).map { case (k, v) =>
        s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
      s""""$name":{"rows_in":${r.rowsIn},"rows_out":${r.rowsOut},"total_sec":${fmt(r.totalSec)},"rows_per_sec":${fmt(r.rowsIn / r.totalSec)},"batch_ms_p50":${fmt(p50)},"batch_ms_max":${fmt(sorted.last)},"state_rows":${r.stateRows},"state_bytes":${r.stateBytes},"duration_ms_mean":$durJson}"""
    }.mkString(",")
    val json =
      s"""{"stream_bench":{"events":$nEvents,"docs":$nDocs,"batches":$nBatches,"keys":$nKeys,"dup_ratio":1.0,"ttl_ms":$TtlMs,"probe":$probeJson,"probe_dir":"$probeDir",$legJson}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "/tmp/stream_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[streambench] $out: ${e.getMessage}") }
    spark.stop()
  }
}
