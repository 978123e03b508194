package graft

import org.apache.spark.sql.functions._

/** Round-13 OPTIMIZATION equivalences: every imperative kernel that
  * replaced a declarative expression chain this round is pinned
  * against the original rendering on the real corpus (plus the edge
  * shapes the originals' filters encoded), and the collected PQ/RQ
  * model path is pinned against full-table determinism invariants.
  */
class Round13OptSpec extends SparkSpec {

  private def words = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("w"))
    .filter(length(col("w")) >= 1)

  test("BpeSpacedSymbols ≡ concat(' ', regexp_replace(w, '(.)', '$1  '))") {
    val bad = words
      .select(col("w"),
        graft.plans.BpeSpacedSymbols(col("w")).as("k"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1  ")).as("d"))
      .filter(col("k") =!= col("d"))
    assert(bad.isEmpty, s"mismatch rows: ${bad.take(3).mkString(";")}")
    // line-terminator passthrough (`.` does not match \n / \r)
    val edge = spark.createDataFrame(Seq(Tuple1("a\nb"), Tuple1("x\ry"), Tuple1("é¢"))).toDF("w")
      .select(graft.plans.BpeSpacedSymbols(col("w")).as("k"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1  ")).as("d"))
      .filter(col("k") =!= col("d"))
    assert(edge.isEmpty, "line-terminator / non-ASCII spacing diverged")
  }

  test("BpeAdjacentPairs / BpeSymbolCount ≡ split(trim(w), '  ') renderings") {
    val spaced = words.select(graft.plans.BpeSpacedSymbols(col("w")).as("w"))
      // include post-merge shapes: apply one real replace pass
      .select(expr("replace(w, concat(' e  r '), ' er ')").as("w"))
    val sy = split(trim(col("w")), "  ")
    val declPairs = expr(
      "transform(sequence(1, size(sy) - 1), i -> struct(element_at(sy, i) AS l, element_at(sy, i + 1) AS r))")
    val bad = spaced.select(col("w"), sy.as("sy"))
      .select(col("w"), col("sy"),
        graft.plans.BpeAdjacentPairs(col("w")).as("k"),
        when(size(col("sy")) >= 2, declPairs)
          .otherwise(expr("array()").cast("array<struct<l:string,r:string>>")).as("d"),
        graft.plans.BpeSymbolCount(col("w")).as("kc"), size(col("sy")).as("dc"))
      .filter(col("k") =!= col("d") || col("kc") =!= col("dc"))
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).mkString(";")}")
  }

  test("TokenShingles ≡ transform(sequence)/slice/array_join positional shingles") {
    for (k <- Seq(2, 3, 8)) {
      val toks = Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val decl = toks.filter(size(col("t")) >= k)
        .select(col("doc_id"), posexplode(
          expr(s"transform(sequence(0, size(t) - $k), i -> array_join(slice(t, i + 1, $k), ' '))"))
          .as(Seq("pos", "s")))
      val kern = toks.select(col("doc_id"), posexplode(
        graft.plans.TokenShingles(col("t"), k)).as(Seq("pos", "s")))
      assert(kern.exceptAll(decl).isEmpty && decl.exceptAll(kern).isEmpty,
        s"TokenShingles k=$k diverged")
    }
  }

  test("TokenBigrams ≡ transform(sequence) struct bigrams") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val decl = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val kern = toks.select(col("doc_id"), explode(
        graft.plans.TokenBigrams(col("t"))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    assert(kern.exceptAll(decl).isEmpty && decl.exceptAll(kern).isEmpty,
      "TokenBigrams diverged")
  }

  test("parquetRowCount ≡ count() on every test table") {
    for (t <- Seq("documents", "embeddings", "lineitem", "nation"))
      assert(Tables.parquetRowCount(spark, sf, t) ===
        spark.read.parquet(s"$sf/$t.parquet").count(),
        s"footer count diverged for $t")
  }

  test("collected RQ model: codes cover the corpus, cids in [0, K)") {
    // rqModel itself is private; emb_rq is its thinnest public view.
    // The oracle pins exact values; this pins the shape invariants
    // the collected-codebook rewrite must preserve.
    val rq = graft.operators.Ann.embRq(spark, sf)
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    assert(rq.count() === n, "one RQ code row per vector")
    val bad = rq.filter(col("cid1") < 0 || col("cid1") >= graft.operators.Ann.RQ_K ||
      col("cid2") < 0 || col("cid2") >= graft.operators.Ann.RQ_K)
    assert(bad.isEmpty, "cid out of codebook range")
  }
}
