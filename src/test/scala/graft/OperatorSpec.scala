package graft

import graft.operators.{AsOfJoin, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkSpec {

  test("as-of join picks the most recent right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("lid"))
    val right = Seq((1L, 90L, 20L), (1L, 100L, 21L), (1L, 200L, 22L), (3L, 10L, 23L))
      .toDF("k", "t", "rid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("rid"))
    val got = AsOfJoin.asOf(left, right, "k", "t", "lid", "rid")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // lid 10 (t=100): right 21 at t=100 (equal time visible, max id among ties/earlier)
    // lid 11 (t=250): right 22 at t=200
    // lid 12 (k=2): no right rows → null
    assert(got === Map(10L -> 21L, 11L -> 22L, 12L -> -1L))
  }

  test("as-of join keeps non-numeric id types (no ANSI cast crash)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "L1"), (1L, 250L, "L2"))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("lid"))
    val right = Seq((1L, 90L, "RA"), (1L, 200L, "RB"))
      .toDF("k", "t", "rid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("rid"))
    val got = AsOfJoin.asOf(left, right, "k", "t", "lid", "rid")
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("L1" -> "RA", "L2" -> "RB"))
  }

  test("multimodal decode is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.decodeFeatures(media)
    val rows = feats.collect()
    assert(rows.length === media.count().toInt)
    assert(rows.forall(f => f.width >= 16 && f.height >= 16 && f.n_bytes > 0))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(rows.sortBy(_.doc_id).map(_.checksum).sameElements(again.sortBy(_.doc_id).map(_.checksum)))
  }

  test("bucketed range join equals the naive theta-join count") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("id", "t")
      .select(col("id"), timestamp_millis(col("t")).as("ts"))
    val left = mk(Seq((1L, 1000L), (2L, 5000L), (3L, 100000L)))
    val right = mk(Seq((10L, 0L), (11L, 900L), (12L, 4500L), (13L, 99000L), (14L, 100001L)))
    val got = RangeJoin.countInWindow(left, right.select("ts"), "id", windowMs = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 1 [0,1000]: right at 0, 900 → 2; id 2 [4000,5000]: 4500 → 1;
    // id 3 [99000,100000]: 99000 → 1 (100001 is after)
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("resize plan preserves aspect ratio, never upscales, floors at 1px") {
    import spark.implicits._
    val feats = Seq(
      Multimodal.MediaFeatures(1L, 10, 0L, 100, 200),   // fits: untouched
      Multimodal.MediaFeatures(2L, 10, 0L, 1024, 512),  // downscale 4x
      Multimodal.MediaFeatures(3L, 10, 0L, 1000, 1)     // degenerate strip
    ).toDS()
    val r = Multimodal.resizePlan(feats, box = 256)
      .collect().map(x => x.doc_id -> x).toMap
    assert((r(1L).out_w, r(1L).out_h, r(1L).scale_pct) === ((100, 200, 100)))
    assert((r(2L).out_w, r(2L).out_h) === ((256, 128)))
    assert(r(3L).out_w === 256 && r(3L).out_h === 1) // 1*256/1000 floors to 0 -> 1px guard
    // out dims never exceed the box
    assert(r.values.forall(x => math.max(x.out_w, x.out_h) <= 256))
  }

  test("frame sampling is exact on frame boundaries and strides") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](1025)(i => (i % 251).toByte) // 5 frames of 256 (last = 1 byte)
    val media = Seq(Multimodal.MediaRow(7L, payload)).toDS()
    val frames = Multimodal.frameSample(media, frameBytes = 256, stride = 4)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 4)) // 5 frames → sampled 0 and 4
    assert(frames(0).n_bytes === 256 && frames(1).n_bytes === 1)
  }

  test("corpus ngram top-k is deterministic, ordered, and df-consistent") {
    val rows = TextAnalysis.textNgramTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 20)
    // ordered by (df desc, ngram asc)
    assert(rows.sameElements(rows.sortBy { case (g, df) => (-df, g) }))
    assert(rows.forall(_._2 >= 1))
  }

  test("quality scores stay in [0,1] and langid emits known labels") {
    val q = TextAnalysis.textQuality(spark, sf).collect()
    assert(q.forall { r =>
      val s = r.getDouble(r.fieldIndex("quality_score")); s >= 0.0 && s <= 1.0
    })
    val langs = TextAnalysis.textLangId(spark, sf)
      .select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a DuckDB oracle (no rows-only gaps)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }
}
