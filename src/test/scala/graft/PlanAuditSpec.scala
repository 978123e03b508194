package graft

/** Plan-regression net: every driver-contract query is planned (at
  * sf0.001 — iterative operators execute their rounds) and its
  * physical plan is swept for the two scale-killers a refactor could
  * silently reintroduce: cartesian products and unbounded
  * BroadcastNestedLoopJoins. BNLJs are allowed only where the
  * broadcast side is BOUNDED by construction (a k-row query set or
  * K-row centroid set — map-only corpus scans, documented in
  * Ann.annBruteForce).
  */
class PlanAuditSpec extends SparkSpec {

  // queries whose plan legitimately contains a BNLJ: the broadcast
  // side is a bounded constant (10 queries / 16 centroids / 45
  // query-pair rows), never a data-sized relation
  private val allowedBnlj = Set(
    "ann_bruteforce", "ann_ivf", "ann_recall", "ann_recall_lsh", // bounded query/centroid side
    "ann_recall_adc", // same bounded exact side as the other recall monitors
    "emb_mrl_recall", // two bounded-broadcast exact scans (full + truncated)
    "emb_ivf_adc", // bounded centroid-table broadcast (probe ranking)
    "sql_cosine", // 10x10 query-vector pair join, pure inequality keys
    "docs_mix_sample", // single-row scalar broadcasts (W, T aggregates)
    "docs_mix_tokens", // same single-row W/T scalar broadcasts on token sums
    "docs_mix_temperature", // same single-row (w_den, budget) scalar broadcast
    "docs_shard_plan", // single-row total-tokens broadcast onto S rows
    "q_benford", // single-row total broadcast onto 9 digit rows
    "q_transitions", // single-row total broadcast onto <=|types|^2 rows
    "q_pareto", // single-row total broadcast onto 10 decile rows
    "q_skew_profile", // single-row total broadcast onto <=64 bucket rows
    "docs_cooc_lift", // single-row corpus-total broadcast onto pair rows
    "text_zipf", // single-row corpus-total broadcast onto k post-limit rows
    "q22_global", // single-row (sum, count) threshold broadcast onto customer
    "text_vocab_coverage", // single-row corpus-total broadcast onto |ks| rows
    "emb_kmeans_train", // k-row centroid-table broadcast (Lloyd assignment fan-out)
    "emb_init_farthest", // <=k-row chosen-set broadcast per selection round
    "emb_cluster_quality", // same k-row broadcast + k x k separation cross
    "text_bpe_merges", "text_bpe_apply", // 1-row merge-winner broadcast per round
    "q15_top_supplier", // 1-row max-revenue broadcast onto the supplier aggregate
    "text_lm_gate", // 1-row histogram-total and 1-row tercile-cut broadcasts
    "emb_rq", // <=16-row codebook broadcast per Lloyd assign (annIvf adjudication)
    "emb_rq_adc", // same bounded codebook broadcasts + nQ*K LUT builds
    "docs_dsir_sample", // 1-row weight-total broadcast onto the weights frame
    // derived-partsupp family: 1-row supplier-count broadcast into
    // the stride-mod assignment (Tpch.partsupp); q11 adds its own
    // 1-row (total, n_parts) threshold broadcast
    "q2_mincost", "q11_stock_value", "q16_supplier_cnt", "q20_promo_parts",
    // 1-row entry-point broadcast crossed with the bounded query set
    "ann_graph_search", "ann_recall_graph",
    // nQ-row query-sample broadcast (fixed-size knnQuerySample) for
    // the exact side, plus the cells/beam bounded broadcasts above
    "ann_recall_cells_s", "ann_recall_graph_s",
    // 1-row folded group-model broadcast (routed two-level assignment)
    "emb_knn_graph_cells", "ann_recall_cells", "emb_semantic_routed",
    // 1-row (n_total, vocab_total) and 1-row m_total scalar broadcasts
    "text_unigram_drift"
  )

  test("no cartesian product or unexpected nested-loop join in any contract query") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!allowedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BroadcastNestedLoopJoin")
    }
  }

  // Queries whose plan legitimately contains an UNPARTITIONED window
  // (all rows through one partition — the third scale-killer this net
  // sweeps for). Each entry names the BOUNDED axis that makes the
  // single partition safe by construction; a new unpartitioned window
  // over corpus-sized rows fails the sweep until it earns an entry.
  private val allowedGlobalWindow: Map[String, String] = Map(
    "q_running_distinct" ->
      "calendar-day axis: one row per day after the per-day distinct agg",
    "q_rolling_dau" ->
      "calendar-day axis: range frame over per-day rows",
    "q_pareto" ->
      "cumulative share over <=|buckets| pre-aggregated rows",
    "text_zipf" ->
      "rank over the post-limit top-k token rows",
    "text_vocab_coverage" ->
      "row_number over the post-limit top-max(k) vocabulary head",
    "text_lm_gate" ->
      ("running sum over the distinct-score histogram: integral " +
        "score axis bounded to <=1e6 rows regardless of corpus size"),
    "q_benford" ->
      "9 leading-digit rows",
    "docs_shard_plan" ->
      "running token total over S planned shards",
    "q_merge_intervals" ->
      ("global sweep-line is the contract; bounded per-day twin " +
        "(q_merge_daily) is the scale rendering — documented trade"),
    "q_sessionize" ->
      ("lag over per-user ordered events WITHIN user partitions only " +
        "(partitioned; listed defensively for the derived global rank)"),
    "emb_label_prop_converge" ->
      ("total-nodes window over the per-round convergence counts: " +
        "<= rounds + 2 rows by construction"))

  test("no unpartitioned window over an unbounded axis in any contract query") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val globals = q(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.simpleString(120)
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w.simpleString(120)
      }
      if (globals.nonEmpty && !allowedGlobalWindow.contains(name))
        Some(s"$name: ${globals.mkString("; ")}")
      else None
    }
    assert(violations.isEmpty,
      "queries planning an unpartitioned window outside the allowlist " +
        s"(single-partition scale hazard):\n${violations.mkString("\n")}")
  }
}
