package graft

import graft.sinks.GraftSink
import org.apache.spark.sql.functions.col

class ZOrderSpec extends SparkSpec {

  private def withTempDir[T](f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try f(dir)
    finally TestSpark.deleteRecursively(dir.toPath)
  }

  test("zValue interleaves bits (b low, a high)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L), (255L, 0L))
      .toDF("a", "b")
      .select(GraftSink.zValue(col("a"), col("b"), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of a -> position 2i+1; bit i of b -> position 2i
    assert(rows === Seq(0L, 2L, 1L, 3L, 15L, 0xAAAAL))
  }

  test("zValue masks keys to [0, 2^bits): no sign-extension leak, deterministic aliasing") {
    import spark.implicits._
    def zOf(a: Long, b: Long): Long =
      Seq((a, b)).toDF("a", "b")
        .select(GraftSink.zValue(col("a"), col("b"), bits = 8))
        .collect().head.getLong(0)
    // each out-of-range key aliases exactly onto its low-8-bit value:
    // -1 → 255 (not a sign-extended garbage curve), 256 → 0, -3 → 253
    assert(zOf(-1L, 0L) === zOf(255L, 0L))
    assert(zOf(256L, 3L) === zOf(0L, 3L))
    assert(zOf(5L, -3L) === zOf(5L, 253L))
    // and in-range values are untouched (mask is the identity there)
    assert(zOf(3L, 3L) === 15L)
  }

  test("z-ordered layout prunes a one-dimension range scan that a cross-column sort cannot") {
    withTempDir { dir =>
      val n = 1 << 16 // 256x256 grid, one row per cell
      val grid = spark.range(n.toLong).select(
        (col("id") % 256).as("x"), (col("id") / 256).as("y"), col("id").as("v"))
      val byX = dir.getAbsolutePath + "/by_x"
      val byZ = dir.getAbsolutePath + "/by_z"
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(byX)
      // 64 files: range boundaries come from SAMPLING (seeded by RDD id,
      // so run-order-dependent); smaller z-ranges per file keep the
      // pruning fraction robustly under the asserted bound wherever the
      // sampled boundaries land
      GraftSink.writeZOrdered(grid, byZ, "x", "y", numFiles = 64, bits = 8)

      // a y-only range predicate: the x-sorted layout cannot prune it
      // (every file spans all y), the z-ordered one can (each file's
      // footer stats bound a y-rectangle)
      def scan(path: String): (Long, Long) = {
        val q = spark.read.parquet(path)
          .filter(col("y") >= 100 && col("y") < 120)
        val rows = q.collect().length.toLong
        val scanned = q.queryExecution.executedPlan.collectLeaves()
          .map(_.metrics("numOutputRows").value).sum
        (rows, scanned)
      }
      val (rowsX, scannedX) = scan(byX)
      val (rowsZ, scannedZ) = scan(byZ)
      assert(rowsX === 20L * 256 && rowsZ === rowsX) // same result set
      // the x-sorted layout reads the whole grid; z-order skips most
      // row groups via footer min/max on y
      assert(scannedX === n.toLong, s"x-sorted layout should scan everything, got $scannedX")
      assert(scannedZ < n.toLong / 2,
        s"z-ordered layout should prune most row groups, scanned $scannedZ of $n")
    }
  }
}
