package graft

/** Scan-hygiene regression net: filters must reach the parquet scan
  * (`PushedFilters`) and projections must prune columns
  * (`ReadSchema`) — the two properties that decide whether a 100 TB
  * scan reads 100 TB or the few columns/rows the query needs. A
  * refactor that wraps a filter in a non-pushable expression or
  * widens a projection silently costs a full-corpus re-read at
  * scale; this spec pins the representative cases.
  */
class PushdownSpec extends SparkSpec {

  // formatted mode: FileScan details (PushedFilters/ReadSchema) are
  // printed in full — the default toString truncates long scan lines
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6_filter pushes every predicate to the lineitem scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters:"))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(p.contains(s"GreaterThanOrEqual($c") || p.contains(s"LessThan($c")
        || p.contains(s"LessThanOrEqual($c"), s"no pushed range filter on $c")
    }
  }

  test("selective doc_id splits push down in the decontamination family") {
    Seq("docs_contamination", "docs_overlap_spans").foreach { q =>
      val p = plan(q)
      assert(p.contains("LessThan(doc_id,50)"), s"$q: bench-side bound not pushed")
      assert(p.contains("GreaterThanOrEqual(doc_id,50)"), s"$q: train-side bound not pushed")
    }
  }

  test("projections prune to the columns the query touches") {
    // embeddings: vec-only ops must not read the label column
    val dims = plan("emb_dim_stats")
    assert(dims.contains("ReadSchema: struct<embedding:array<float>>"),
      "emb_dim_stats reads more than the embedding column")
    // documents: text analytics must not read n_chars/source
    val tok = plan("text_tokens")
    assert(!tok.contains("n_chars") && !tok.contains("source"),
      "text_tokens reads unused document columns")
    // lineitem q1 reads its 4 aggregate inputs + 2 keys, not all 16
    val q1 = plan("q1_agg")
    val rs = q1.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("l_comment") && !rs.contains("l_partkey"),
      s"q1_agg scan not pruned: $rs")
  }

  test("query-bounded ANN sides push their vec_id bounds") {
    Seq("ann_bruteforce" -> "LessThan(vec_id,10)",
        "emb_adc" -> "LessThan(vec_id,5)").foreach { case (q, f) =>
      assert(plan(q).contains(f), s"$q: query-set bound $f not pushed")
    }
  }

  test("third-wave operators keep scan hygiene") {
    // nearest join: both event_type selections reach the scan
    val near = plan("q_asof_nearest")
    assert(near.contains("EqualTo(event_type,purchase)") &&
      near.contains("EqualTo(event_type,error)"),
      "q_asof_nearest: type filters not pushed")
    // collocation mining reads only (doc_id, text) — never lang/
    // source/n_chars
    val cooc = plan("docs_cooc_lift")
    assert(!cooc.contains("n_chars") && !cooc.contains("source"),
      "docs_cooc_lift reads unused document columns")
    // anomaly gate reads its 3 columns, not ts/user/props
    val anom = plan("q_anomaly")
    val rs = anom.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("props") && !rs.contains("user_id"),
      s"q_anomaly scan not pruned: $rs")
    // transition matrix reads its 4 columns, never value/props
    // (q_pareto/q_rolling_dau hide their scans behind the lazy
    // checkpoint boundary, so the transition matrix pins the
    // events-prune case for the engagement family)
    val trans = plan("q_transitions")
    val trs = trans.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!trs.contains("value") && !trs.contains("props"),
      s"q_transitions scan not pruned: $trs")
  }

  test("tpch wave keeps scan hygiene and broadcasts its dimensions") {
    // q19: the brand disjunction factors out to an In() on the part
    // scan (the classic Q19 pushdown property)
    val p19 = plan("q19_disjunct")
    assert(p19.contains("In(p_brand"),
      "q19_disjunct: brand disjunction not pushed to the part scan")
    // q10: returnflag + the order-date quarter reach their scans
    val p10 = plan("q10_returns")
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      "q10_returns: returnflag not pushed")
    assert(p10.contains("GreaterThanOrEqual(o_orderdate"),
      "q10_returns: order-date window not pushed")
    // q7: the lineitem scan carries only the 4 touched columns
    val p7 = plan("q7_volume")
    val rs7 = p7.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs7.contains("l_tax") && !rs7.contains("l_linestatus"),
      s"q7_volume lineitem scan not pruned: $rs7")
    // every dimension side rides a broadcast join; the only
    // sort-merge allowed is the fact-fact lineitem join on orderkey
    Seq("q7_volume", "q8_share", "q9_margin", "q10_returns").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q: dimension joins are not broadcast")
    }
  }

  test("round-5 ops keep scan hygiene") {
    // the k-means trainer touches only the two embedding columns
    val km = plan("emb_kmeans_train")
    val kmrs = km.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!kmrs.contains("label"), s"emb_kmeans_train reads label: $kmrs")
    // map-only text audits read only (doc_id, text)
    // (text_vocab_coverage now hides its scan behind the compute-once
    // lazy checkpoint of the word-count pass — same precedent as
    // q_pareto/q_rolling_dau — so text_charclass pins the
    // documents-prune case for the text-audit family)
    Seq("docs_gopher_rules", "mm_audio_segments", "text_charclass").foreach { q =>
      val rs = plan(q).linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!rs.contains("n_chars") && !rs.contains("lang") && !rs.contains("source"),
        s"$q reads unused document columns: $rs")
    }
    // dup-span localization prunes to (doc_id, text) on every scan
    val ds = plan("docs_dup_spans")
    val dsrs = ds.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!dsrs.contains("n_chars") && !dsrs.contains("source"),
      s"docs_dup_spans reads unused document columns: $dsrs")
  }
}
