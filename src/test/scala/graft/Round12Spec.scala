package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 invariants: ADVICE nit closures (stack-label escaping,
  * fingerprint-family n_bytes consistency), exact out-degree rank
  * propagation, hashed contamination probe, sampled recall monitors,
  * incremental near-dup, and the parallel presentation sort.
  */
class Round12Spec extends SparkSpec {

  test("NB source labels with quotes/backslashes round-trip through stack()") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // Spark SQL string literals escape with backslash — a source name
    // containing ' or \ must label its own rows, not a mangled one
    val docs = Seq(
      (1L, "it's", "alpha beta alpha gamma"),
      (2L, "it's", "beta alpha gamma beta"),
      (3L, raw"back\slash", "spam click buy now"),
      (4L, raw"back\slash", "click spam now buy")).toDF("doc_id", "source", "text")
    val cm = TextAnalysis.textNbSourcesOn(docs)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("predicted")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(cm === Map(("it's", "it's") -> 2L, (raw"back\slash", raw"back\slash") -> 2L),
      s"labels must survive the stack() literal round-trip: $cm")
  }

  test("NB source classifier excludes null-source docs instead of crashing") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, Some("wiki"), "alpha beta alpha"),
      (2L, Some("wiki"), "beta alpha beta"),
      (3L, None, "orphan text row")).toDF("doc_id", "source", "text")
    val cm = TextAnalysis.textNbSourcesOn(docs).collect()
    assert(cm.map(_.getAs[Long]("n_docs")).sum === 2L,
      "null-source docs are outside the labeled taxonomy")
  }

  test("fingerprint family exposes ONE n_bytes definition (audio_fp == dup_keep)") {
    import graft.operators.Multimodal
    val fp = Multimodal.mmAudioFp(spark, sf)
      .select(col("doc_id"), col("n_bytes").cast("long").as("nb_fp"))
    val keep = Multimodal.mmAudioDupKeep(spark, sf)
      .select(col("doc_id"), col("n_bytes").as("nb_keep"))
    val bad = fp.join(keep, "doc_id").filter(col("nb_fp") =!= col("nb_keep"))
    assert(bad.isEmpty, "the same doc reported two different n_bytes in one family")
  }
}
