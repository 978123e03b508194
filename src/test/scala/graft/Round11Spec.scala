package graft

import graft.operators.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 invariants: the corpus-wide ExactSubstr dedup action
  * (Lee et al. 2022) — planted-span semantics plus structural
  * invariants on the real corpus.
  */
class Round11Spec extends SparkSpec {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("substr dedup: a >=k-token span shared by three docs is removed from all three") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ") // 10 tokens > k=8
    val docs = docsOf(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"one two three $shared four",
      3L -> s"$shared tail piece here now",
      4L -> "entirely unique text with no repeated spans at all")
    val out = NearDup.docsSubstrDedupOn(docs, k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size === 4, "every doc must stay present")
    // the shared 10-token span is covered; unique flanks survive
    Seq(1L, 2L, 3L).foreach { id =>
      val r = out(id)
      assert(r.getAs[Long]("n_removed_tokens") === 10L,
        s"doc $id should lose exactly the 10 shared tokens")
      assert(r.getAs[Long]("n_removed_spans") === 1L)
    }
    val clean = out(4L)
    assert(clean.getAs[Long]("n_removed_tokens") === 0L)
    assert(clean.getAs[Long]("n_removed_spans") === 0L)
    assert(clean.getAs[Long]("kept_frac_e4") === 10000L)
  }

  test("substr dedup: intra-document repetition counts — both copies covered") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = docsOf(1L -> s"$span middle filler words go here $span")
    val r = NearDup.docsSubstrDedupOn(docs, k = 8).head()
    // both occurrences of the 8-token span are duplicated shingles
    assert(r.getAs[Long]("n_removed_tokens") === 16L)
    assert(r.getAs[Long]("n_removed_spans") === 2L)
    assert(r.getAs[Long]("n_tokens") === 21L)
  }

  test("substr dedup: a fully-duplicated doc keeps the empty-string md5 witness") {
    val span = (1 to 9).map(i => s"z$i").mkString(" ")
    val docs = docsOf(1L -> span, 2L -> span)
    val out = NearDup.docsSubstrDedupOn(docs, k = 8).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_removed_tokens") === 9L)
      assert(r.getAs[String]("clean_md5") ===
        "d41d8cd98f00b204e9800998ecf8427e") // md5("")
      assert(r.getAs[Long]("kept_frac_e4") === 0L)
    }
  }

  test("substr dedup: docs shorter than k tokens pass through untouched") {
    val docs = docsOf(1L -> "short doc", 2L -> "short doc")
    val out = NearDup.docsSubstrDedupOn(docs, k = 8).collect()
    assert(out.length === 2)
    out.foreach(r => assert(r.getAs[Long]("n_removed_tokens") === 0L))
  }

  test("substr dedup structural invariants on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val out = NearDup.docsSubstrDedupOn(docs, k = 8)
    val nDocs = docs.count()
    assert(out.count() === nDocs, "row-preserving: one output row per doc")
    val bad = out.filter(
      col("n_removed_tokens") > col("n_tokens") ||
      col("n_removed_spans") * 8 > col("n_removed_tokens") ||
      (col("n_removed_tokens") > 0 && col("n_removed_spans") === 0))
    assert(bad.isEmpty, "span arithmetic: each maximal removed run has >= k tokens")
    // untouched docs reconstruct byte-identically (md5(text) witness)
    val untouched = out.filter(col("n_removed_tokens") === 0)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig_md5")), "doc_id")
      .filter(col("clean_md5") =!= col("orig_md5"))
    assert(untouched.isEmpty, "zero-removal docs must reconstruct byte-identical text")
  }
}
