package graft

import graft.sources.CsvSource

class CsvSourceSpec extends SparkSpec {

  private val header = "doc_id,text,lang,source,n_chars"
  private val goodRows = Seq(
    """1,hello world,en,web,11""",
    """2,bonjour,fr,web,7""",
    """3,third,en,book,5""")
  // schema violations: non-numeric id / truncated row
  private val corruptRows = Seq(
    """not_a_number,oops,en,web,4""")

  private def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("csv_src").toFile
    try f(dir)
    finally {
      def rm(d: java.io.File): Unit = {
        Option(d.listFiles()).foreach(_.foreach(rm)); d.delete()
      }
      rm(dir)
    }
  }

  test("csv read splits clean rows from quarantined schema violations") {
    withTempDir { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "part0.csv"),
        (header +: (goodRows ++ corruptRows)).mkString("\n").getBytes("UTF-8"))
      val raw = CsvSource.read(spark, dir.getAbsolutePath)
      val clean = CsvSource.clean(raw).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1)
      assert(clean === Array(
        (1L, "hello world", "en", "web", 11L),
        (2L, "bonjour", "fr", "web", 7L),
        (3L, "third", "en", "book", 5L)))
      val bad = CsvSource.withCorrupt(raw)(_.collect()).map(_.getString(0)).sorted
      assert(bad === corruptRows.sorted.toArray.toSeq)
    }
  }

  test("csv write/read roundtrips the documents contract table") {
    withTempDir { dir =>
      val out = dir.getAbsolutePath + "/docs_csv"
      val docs = Tables.documents(spark, sf)
      CsvSource.write(docs, out, shards = 2)
      val back = CsvSource.clean(CsvSource.read(spark, out))
      assert(back.count() === docs.count())
      // spot-check content equality on the id axis (quotes/escapes
      // must round-trip multilingual text intact)
      val a = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      val b = back.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      assert(a === b)
    }
  }

  test("csv streaming ingest feeds the cleaning gate") {
    withTempDir { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getAbsolutePath, "drop0.csv"),
        (header +: goodRows).mkString("\n").getBytes("UTF-8"))
      val stream = CsvSource.clean(CsvSource.readStream(spark, dir.getAbsolutePath))
        .select("doc_id", "text")
      val gated = graft.streaming.CleanStream.gopherGate(stream)
      val q = gated.writeStream.format("memory").queryName("csv_gate")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("csv_gate").collect()
        assert(got.length === goodRows.length)
        // short planted docs fail the word-count rule, proving the
        // gate actually evaluated (not just passed rows through)
        assert(got.forall(!_.getAs[Boolean]("pass")))
      } finally q.stop()
    }
  }
}
