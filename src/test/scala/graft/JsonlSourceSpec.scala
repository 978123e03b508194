package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.functions._

class JsonlSourceSpec extends SparkSpec {

  private val goodLines = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}""",
    """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}""",
    """{"doc_id": 3, "text": "third", "lang": "en", "source": "book", "n_chars": 5}""")
  private val corruptLines = Seq(
    """{"doc_id": 4, "text": "unterminated""",
    """not json at all""")

  private def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_src").toFile
    try f(dir)
    finally {
      def rm(d: java.io.File): Unit = {
        Option(d.listFiles()).foreach(_.foreach(rm)); d.delete()
      }
      rm(dir)
    }
  }

  test("jsonl read splits clean rows from quarantined corrupt lines") {
    withTempDir { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "part0.jsonl"),
        scala.util.Random.shuffle(goodLines ++ corruptLines).mkString("\n").getBytes("UTF-8"))
      val raw = JsonlSource.read(spark, dir.getAbsolutePath)
      val clean = JsonlSource.clean(raw).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1)
      assert(clean === Array(
        (1L, "hello world", "en", "web", 11L),
        (2L, "bonjour", "fr", "web", 7L),
        (3L, "third", "en", "book", 5L)))
      // every corrupt input line lands in quarantine verbatim
      val bad = JsonlSource.withCorrupt(raw)(_.collect()).map(_.getString(0)).sorted
      assert(bad === corruptLines.sorted.toArray.toSeq)
    }
  }

  test("jsonl write/read roundtrips the documents contract table") {
    withTempDir { dir =>
      val docs = Tables.documents(spark, sf)
      val out = dir.getAbsolutePath + "/docs"
      JsonlSource.write(docs, out, shards = 4)
      val back = JsonlSource.clean(JsonlSource.read(spark, out))
      assert(back.count() === docs.count())
      // content identical row-for-row (join on doc_id, all columns equal)
      val mismatched = back.as("b").join(docs.as("d"), "doc_id")
        .filter(col("b.text") =!= col("d.text") || col("b.lang") =!= col("d.lang") ||
          col("b.source") =!= col("d.source") || col("b.n_chars") =!= col("d.n_chars"))
        .count()
      assert(mismatched === 0L)
      assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".json")) === 4)
    }
  }

  test("jsonl streaming ingest feeds the dedup pipeline") {
    withTempDir { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "drop1.jsonl"),
        (goodLines ++ corruptLines).mkString("\n").getBytes("UTF-8"))
      val stream = JsonlSource.clean(JsonlSource.readStream(spark, dir.getAbsolutePath))
      val q = stream.writeStream.format("memory").queryName("jsonl_in")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("jsonl_in").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
      } finally q.stop()
    }
  }

  test("fixed-size sample takes exactly k per stratum, hash-ranked") {
    import graft.operators.Sampling
    val k = 20
    val got = Sampling.docsSampleFixed(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val expect = ds.map(_._1).sortBy(id => (Sampling.hash32Of(id), id)).take(k)
      val gotLang = got.filter(_._2 == lang).sortBy(_._3)
      assert(gotLang.map(_._1).toSeq === expect.toSeq, s"lang $lang")
      assert(gotLang.map(_._3).toSeq === (1L to math.min(k, ds.length)).toSeq)
    }
  }
}
