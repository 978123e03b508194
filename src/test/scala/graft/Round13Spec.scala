package graft

import org.apache.spark.sql.functions._

/** Round-13 invariants: manifest maintenance for the incremental
  * near-dup loop (append ≡ rebuild), the label-propagation
  * convergence monitor, and multi-entry beam seeding.
  */
class Round13Spec extends SparkSpec {

  test("manifest append ≡ full rebuild: batch₂ vs history ∪ batch₁") {
    import graft.operators.NearDup
    // three disjoint corpus slices: h (history), b1 (first accepted
    // batch), b2 (the batch under test)
    val docs = Tables.documents(spark, sf)
    val sliced = NearDup.shingledDocs(docs).localCheckpoint()
    val h = sliced.filter(pmod(col("doc_id"), lit(5L)).isin(2L, 3L, 4L))
    val b1 = sliced.filter(pmod(col("doc_id"), lit(5L)) === 1L)
    val b2 = sliced.filter(pmod(col("doc_id"), lit(5L)) === 0L)
    val tMaint = "graft_r13_manifest_maint"
    val tRebuild = "graft_r13_manifest_rebuild"
    try {
      // production N+1 loop: write history once, APPEND b1's keys
      NearDup.writeBandManifest(spark, NearDup.bandManifestKeys(h), tMaint)
      NearDup.writeBandManifest(spark, NearDup.bandManifestKeys(b1), tMaint,
        append = true)
      // the from-scratch control: one manifest over history ∪ b1
      NearDup.writeBandManifest(spark,
        NearDup.bandManifestKeys(h.unionByName(b1)), tRebuild)
      val maint = NearDup.neardupAgainstManifest(spark, b2, tMaint, sliced)
        .localCheckpoint()
      val rebuild = NearDup.neardupAgainstManifest(spark, b2, tRebuild, sliced)
      assert(maint.exceptAll(rebuild).isEmpty && rebuild.exceptAll(maint).isEmpty,
        "appended manifest must probe identically to a full rebuild")
      assert(maint.count() > 0,
        "fixture produced no cross-slice near-dups — spec is vacuous")
      // and the appended keys really are IN the manifest (b1 docs
      // must be probe-able as history for b2)
      assert(maint.select("hist_id")
        .filter(pmod(col("hist_id"), lit(5L)) === 1L).count() > 0,
        "no pair hit the appended batch's keys — append-path untested")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tMaint")
      spark.sql(s"DROP TABLE IF EXISTS $tRebuild")
    }
  }

  test("label-prop convergence monitor: hand-computed rounds on the tiny fixture") {
    import graft.operators.Ann
    import spark.implicits._
    // same fixture as Round12Spec's propagation test: seeds 2,3 at
    // round 0; nodes 1,4 labeled in round 1; node 5 never labeled
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(
      (1L, None: Option[Long]), (2L, Some(7L)), (3L, Some(9L)),
      (4L, None: Option[Long]), (5L, None: Option[Long])).toDF("vec_id", "label")
    val out = Ann.labelPropConvergence(Ann.labelPropOn(edges, seeds, rounds = 2))
      .collect().map(r => r.getAs[Long]("round") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("frac_e6"))).toMap
    assert(out === Map(
      -1L -> (1L, 200000L),  // node 5: never labeled
      0L -> (2L, 400000L),   // the seed set
      1L -> (2L, 400000L)))  // nodes 1 and 4; round 2 converged (absent)
  }

  test("convergence monitor totals the trajectory exactly") {
    import graft.operators.Ann
    val traj = Ann.embKnnLabelProp(spark, sf).localCheckpoint()
    val mon = Ann.labelPropConvergence(traj).localCheckpoint()
    assert(mon.agg(sum("n_new")).head.getLong(0) === traj.count(),
      "per-round counts must partition the node set")
    assert(mon.filter(col("frac_e6") < 0 || col("frac_e6") > 1000000).isEmpty)
  }

  test("multi-entry beam: nprobe past the cell count is a no-op (seed roster saturates)") {
    import graft.operators.Ann
    // with 16 trained cells, nprobe=16 probes every cell — any larger
    // nprobe must produce the identical search output
    val a = Ann.annGraphSearch(spark, sf, nprobe = 16).localCheckpoint()
    val b = Ann.annGraphSearch(spark, sf, nprobe = 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "nprobe ≥ K must saturate the seed set")
    assert(a.count() > 0)
  }

  test("multi-entry beam output shape: ≤ k ranked rows per query, dense ranks") {
    import graft.operators.Ann
    val out = Ann.annGraphSearch(spark, sf).localCheckpoint()
    val byQ = out.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx"), min("rnk").as("mn"))
    assert(byQ.filter(col("n") > 5 || col("mx") =!= col("n") || col("mn") =!= 1).isEmpty,
      "each query must emit a dense 1..n ≤ k rank list")
  }
}
