package graft

/** Data-movement regression net — the byte-level complement of
  * PlanAuditSpec: that spec catches cartesians and unexpected BNLJs,
  * but a broadcast join silently degrading to a shuffle join (a
  * detach removed, a size estimate drifting past the threshold) is
  * INVISIBLE to it — the plan is still "a join". Here a
  * representative query per family executes at sf0.001 under a
  * task-metrics listener and its total shuffle-write bytes must stay
  * under a per-query budget set at ~4× the observed healthy value:
  * far above run-to-run noise (bytes are deterministic for a fixed
  * plan + data + partition count), far below what losing a broadcast
  * costs (the corpus-sized side lands in the shuffle, typically
  * 100×+). A new shuffle anywhere in a guarded query's plan fails
  * here before it ever reaches a benchmark.
  */
class MovementSpec extends SparkSpec {

  private def settledShuffleWrite(run: => Unit): Long = {
    // the same meter Bench uses — one listener, one settle heuristic
    val acc = new MovementMeter
    spark.sparkContext.addSparkListener(acc)
    try { run; acc.settled._2 }
    finally spark.sparkContext.removeSparkListener(acc)
  }

  // budgets in KiB at sf0.001, ~4x the healthy observed shuffle-write;
  // losing a broadcast puts a table-sized side into the shuffle and
  // blows any of these by orders of magnitude
  private val budgetsKiB: Seq[(String, Long)] = Seq(
    "q5_multijoin" -> 256, // 6-table join: all dims broadcast, fact only aggregates
    "q3_join" -> 256, // selective fact-fact join
    "docs_dsir_weights" -> 256, // bucket table must BROADCAST (4096 rows)
    "text_lm_gate" -> 256, // histogram + cuts are 1-row broadcasts
    "docs_minhash_lsh" -> 1024, // banded signatures shuffle, bounded
    "emb_rq" -> 2048, // codebooks broadcast; only per-vector rows shuffle
    "text_tfidf" -> 2048, // detached df table, keyed shuffles only
    "q_topk" -> 64 // TakeOrderedAndProject, near-zero shuffle
  )

  test("per-family shuffle-write budgets hold (a lost broadcast fails here, not in a bench)") {
    budgetsKiB.foreach { case (name, kib) =>
      val bytes = settledShuffleWrite {
        SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      info(f"$name%-22s ${bytes / 1024}%6d KiB of $kib%5d KiB budget")
      assert(bytes <= kib * 1024,
        s"$name shuffled ${bytes / 1024} KiB at sf0.001, budget $kib KiB — " +
          "did a broadcast degrade to a shuffle join?")
    }
  }
}
