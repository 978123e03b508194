package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Queries execute fully via the noop sink
  * (count() would let Catalyst prune projections and under-measure);
  * a small untimed warmup first JIT-compiles the scan/codegen paths
  * so per-query numbers measure the plan, not the JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions default to the core count (right at the test
    // SFs) but are an independent knob for scale soaks: at sf10 the
    // 32-partition default puts 50+ MB into single sort buffers and
    // spills — the partitions-sized-to-bytes rule SURVEY §5 prescribes
    // for 100 TB, demonstrable here by raising this
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // shuffle/spill codec knob for scale soaks: zstd compresses the
    // text-heavy pair-family exchanges ~2x tighter than the lz4
    // default — at sf100 that is the difference between a 62 GB and
    // a ~30 GB on-disk shuffle for one query (the scratch-disk
    // analog of a cluster's shuffle-service capacity planning).
    // Movement bytes are measured post-codec, so artifacts produced
    // under a non-default codec say so in their filename.
    val ioCodec = sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // belt to the per-query System.gc() braces: the cleaner's own
      // periodic GC defaults to 30 min — longer than an entire batch
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.io.compression.codec", ioCodec)
      // ObjectHashAggregate (typed Aggregators / udaf on the SQL
      // surface) falls back to SORT-based aggregation after 128
      // distinct keys per task BY DEFAULT — at sf100 that turned
      // sql_simhash's per-doc fold into a full sort of 250 M exploded
      // token rows (x61/decade, round-11 widen). Per-task key counts
      // are bounded by keys/partitions (~10k docs/task at sf100
      // p512), so a 4M-key hash map threshold keeps the partial
      // aggregate map-combinable; state is per-key bounded (64-int
      // simhash vector). Execution knob only — results unchanged.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // presentation sorts detach (lazy localCheckpoint): the range
    // sampling pass reads materialized blocks instead of re-executing
    // the query DAG — execution knob only (SparkEntry.presentBy).
    // SPARK_GRAFT_PRESENT_DETACH=0 disables for A/B soaks: for a
    // cheap-map row-preserving child, re-executing the scan twice
    // can beat storing the full result.
    if (!sys.env.get("SPARK_GRAFT_PRESENT_DETACH").contains("0"))
      spark.conf.set("graft.present.detach", "true")

    // Data-movement accounting: task-level shuffle/spill/input bytes
    // accumulated via a SparkListener, snapshotted per query — wall
    // seconds say WHETHER a query is slow, these say WHY (a shuffle
    // that is fine at sf0.1 but is the 100 TB bottleneck shows up as
    // bytes here long before it shows up as seconds). Listener events
    // are async, so each snapshot first lets the counters SETTLE
    // (bounded poll, outside the timed region); a one-stage lag on a
    // rare race only blurs adjacent queries' attribution, never the
    // totals.
    val mv = new MovementMeter
    spark.sparkContext.addSparkListener(mv)
    val movement = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long, Long, Long)]

    // A failed query must be VISIBLE: it is reported in "failed", its
    // per-query slot reads -1 (never summed into total), and the
    // process exits nonzero — a broken query must not make the bench
    // look faster or the JSON look complete.
    // SPARK_GRAFT_BENCH_CORE=1: swap in SparkEntry.coreQueries where
    // one exists — the analytic-core rendering (no presentation sort)
    // a 100 TB run executes. Soak knob only; the driver contract and
    // Verify always run the presentation-exact `queries` map.
    val coreMode = sys.env.get("SPARK_GRAFT_BENCH_CORE").contains("1")
    def queryFor(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (coreMode) SparkEntry.coreQueries.getOrElse(name, SparkEntry.queries(name))
      else SparkEntry.queries(name)

    def execute(name: String): Double = {
      // Shuffle files of FINISHED queries are only deleted when the
      // ContextCleaner's weak refs get GC'd — with a large soak heap
      // the JVM can run an entire batch without a single full GC, so
      // per-query shuffle dirs ACCUMULATE on the scratch disk (the
      // sf100 soak measured 62 GB of dead blockmgr files before
      // ENOSPC). A forced GC between queries (outside the timed
      // region) bounds scratch usage at the per-query footprint —
      // the local-mode analog of a cluster shuffle service's
      // retention policy.
      System.gc()
      val t0 = System.nanoTime()
      try queryFor(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** execute() + attribute the settled movement delta to `name`. */
    def executeTracked(name: String): Double = {
      val before = mv.settled
      val t = execute(name)
      val after = mv.settled
      if (t >= 0)
        movement(name) = (after._1 - before._1, after._2 - before._2,
          after._3 - before._3, after._4 - before._4)
      t
    }

    // untimed warmup: full scan of every table (file listing, footers,
    // parquet read path) + one query for codegen/JIT — so the first
    // timed query per table doesn't absorb the cold-read cost. Read
    // through Tables.* (events is TIMESTAMP(NANOS) parquet and needs
    // its reader's legacy conf); each table warms in its own try so
    // one failure can't skip the rest.
    val warmReaders: Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame] = Seq(
      Tables.region, Tables.nation, Tables.customer, Tables.supplier,
      Tables.part, Tables.orders, Tables.lineitem, Tables.events,
      Tables.documents, Tables.embeddings)
    warmReaders.foreach { rd =>
      try rd(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    }
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup q1: ${e.getMessage}") }

    // Constant-plan probe: median of 3 timed runs of two stable
    // scan-shaped queries (full-scan agg + pushed-filter agg). Their
    // plans never change across rounds, so the ratio probe_now /
    // probe_baseline is a box-speed normalizer — emitted in the JSON
    // so cross-box comparison of absolute seconds is mechanical
    // instead of estimated from overlapping query keys.
    def median3(name: String): Double = {
      val ts = Seq.fill(3)(execute(name)).filter(_ >= 0).sorted
      if (ts.isEmpty) -1.0 else ts(ts.size / 2)
    }
    val probe = Seq("q1_agg", "q6_filter").map(n => n -> median3(n))
    val probeJson = probe.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    // Optional subset (comma-separated names) for targeted soaks —
    // e.g. the sf1 heavy-family run — without changing the default
    // full-surface contract the driver relies on.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // SPARK_GRAFT_BENCH_REPS > 1 (targeted tuning only): run each
    // query N times and report the minimum — isolates plan cost from
    // first-run JIT/codegen-compile noise when comparing variants.
    // The driver contract stays reps=1 (cold, one pass).
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(1)
    val results = names.map { n =>
      // movement is attributed on the FIRST rep (cold, the driver
      // contract); min-time still comes from all reps
      val ts = executeTracked(n) +: Seq.fill(reps - 1)(execute(n))
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Stamp every artifact with the git SHA of the benched tree
    // (VERDICT r12 #8: Bench overwrites a global /tmp path, and a
    // stale artifact from a prior round is indistinguishable without
    // provenance). Best-effort: "unknown" outside a git checkout.
    val sha = try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val s = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      if (p.waitFor() == 0 && s.matches("[0-9a-f]+")) s else "unknown"
    } catch { case _: Throwable => "unknown" }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","sha":"$sha","queries":$qs,"probe":$probeJson,"failed":${failed.mkString("[", ",", "]")},"core":$coreMode,"sf":"$sfDir"}"""
    println(json)
    // The driver archives only the LAST 2000 chars of stdout, and the
    // per-query map alone exceeds that — so the full line above loses
    // its leading total in the archived tail. Print a COMPACT summary
    // line LAST (≈200 chars: total + probe + failures, no per-query
    // map) so the archived tail always contains one complete,
    // parseable JSON record with the headline numbers.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","sha":"$sha","n_queries":${names.size},"probe":$probeJson,"failed":${failed.mkString("[", ",", "]")},"core":$coreMode,"sf":"$sfDir"}"""
    println(compact)
    // stdout is wrapped in sbt [info] noise, so also write the bare
    // JSON where tooling can parse it without de-prefixing. The full
    // record is the ONLY line in $SPARK_GRAFT_BENCH_OUT (a whole-file
    // json.load works); the compact summary goes to a sibling
    // *_summary.json so no consumer ever sees a two-document file.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    val summaryOut =
      if (out.endsWith(".json")) out.stripSuffix(".json") + "_summary.json"
      else out + "_summary.json"
    def writeLine(path: String, line: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] write $path: ${e.getMessage}") }
    writeLine(out, json)
    writeLine(summaryOut, compact)
    // Per-query movement record (MB, 2dp) → sibling *_movement.json —
    // its own single-document file, same rule as the summary.
    val movementOut =
      if (out.endsWith(".json")) out.stripSuffix(".json") + "_movement.json"
      else out + "_movement.json"
    // Locale.ROOT: the default-locale f-interpolator renders comma
    // decimals under e.g. de_DE, which is not JSON
    def mb(b: Long): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(b / 1048576.0))
    val mvJson = movement.map { case (k, (r, w, s, i)) =>
      "\"" + k + "\":{\"shuffle_read_mb\":" + mb(r) + ",\"shuffle_write_mb\":" + mb(w) +
        ",\"spilled_mb\":" + mb(s) + ",\"input_mb\":" + mb(i) + "}"
    }.mkString("{\"unit\":\"MB\",\"sha\":\"" + sha + "\",\"sf\":\"" + sfDir + "\",\"queries\":{", ",", "}}")
    writeLine(movementOut, mvJson)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
