package graft

import graft.sources.EvolvingParquet
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class EvolvingParquetSpec extends SparkSpec {

  private val contract = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("evolve_pq").toFile
    try f(dir)
    finally TestSpark.deleteRecursively(dir.toPath)
  }

  private def writeGens(dir: java.io.File): Unit = {
    import spark.implicits._
    // gen 1 predates the lang column; gen 2 adds lang AND a debug
    // column the contract never adopted
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/g1")
    Seq((3L, "gamma", "en", 99L), (4L, "delta", "fr", 98L))
      .toDF("doc_id", "text", "lang", "debug_col")
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/g2")
    // flatten both generations into one directory, as a lake would
    def moveParts(sub: String, tag: String): Unit = {
      val from = new java.io.File(dir, sub)
      from.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (fp, i) =>
          java.nio.file.Files.move(fp.toPath,
            new java.io.File(dir, s"$tag-$i.parquet").toPath)
        }
      TestSpark.deleteRecursively(from.toPath)
    }
    moveParts("g1", "gen1"); moveParts("g2", "gen2")
  }

  test("batch read conforms mixed-generation files to the contract schema") {
    withTempDir { dir =>
      writeGens(dir)
      val got = EvolvingParquet.read(spark, dir.getAbsolutePath, contract)
      assert(got.schema === contract)
      val rows = got.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).sortBy(_._1)
      assert(rows === Array(
        (1L, "alpha", None), (2L, "beta", None), // pre-lang files → nulls
        (3L, "gamma", Some("en")), (4L, "delta", Some("fr"))))
    }
  }

  test("conform materializes fully-missing contract columns and drops extras") {
    import spark.implicits._
    val df = Seq((1L, 7L)).toDF("doc_id", "debug_col")
    val got = EvolvingParquet.conform(df, contract)
    // names + types match; nullability may stay TIGHTER than the
    // contract (a non-nullable input column remains non-nullable)
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      contract.map(f => (f.name, f.dataType)))
    val r = got.collect().head
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("conform resolves columns case-insensitively like Spark's default resolution") {
    import spark.implicits._
    val df = Seq((7L, "Hi", "en")).toDF("Doc_Id", "TEXT", "Lang")
    val got = EvolvingParquet.conform(df, contract).collect().head
    // real values conform under the contract names — never nulled for
    // a case mismatch
    assert(got.getLong(0) === 7L && got.getString(1) === "Hi" && got.getString(2) === "en")
  }

  test("conform fails fast on case-colliding input columns") {
    import spark.implicits._
    // mergeSchema over case-sensitively written generations can
    // surface both `lang` and `Lang`; resolving either silently
    // would pick an arbitrary winner — conform names the collision
    val df = Seq((7L, "Hi", "en", "EN")).toDF("doc_id", "text", "lang", "Lang")
    val e = intercept[IllegalArgumentException] {
      EvolvingParquet.conform(df, contract)
    }
    assert(e.getMessage.contains("case-colliding") && e.getMessage.contains("lang"))
  }

  test("streaming read under the contract schema accepts old-generation files") {
    withTempDir { dir =>
      writeGens(dir)
      val stream = EvolvingParquet.readStream(spark, dir.getAbsolutePath, contract)
      val q = stream.writeStream.format("memory").queryName("evolve_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.table("evolve_out").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getString(2))))
          .sortBy(_._1)
        assert(rows === Array((1L, None), (2L, None),
          (3L, Some("en")), (4L, Some("fr"))))
      } finally q.stop()
    }
  }

  test("column pruning reaches the scan through conform") {
    withTempDir { dir =>
      writeGens(dir)
      val plan = EvolvingParquet.read(spark, dir.getAbsolutePath, contract)
        .select(col("doc_id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
        s"doc_id-only projection should prune the scan, got:\n$plan")
    }
  }
}
