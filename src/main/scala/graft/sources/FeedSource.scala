package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest seam for raw feed lines — the abstraction point where the
  * reference plugs Pulsar (Main.java:17-24, `environment.conf`
  * pulsar block). Everything downstream (parse → dedup → analytics)
  * consumes a one-column `line` DataFrame and never sees the bus.
  *
  * This sandbox has no message-bus connector jars (zero egress), so
  * the provided implementations are file and in-memory; a Pulsar
  * implementation maps 1:1 onto this trait with the public
  * StreamNative `pulsar-spark` connector:
  * {{{
  * spark.readStream.format("pulsar")
  *   .option("service.url", serviceUrl)          // pulsar://host:6650
  *   .option("topicsPattern", topicsPattern)     // multi-topic merge
  *   .load()
  *   .selectExpr("CAST(value AS STRING) AS line")
  * }}}
  * (same for batch `spark.read`). The reference's `multipleTopics`
  * merge is the connector's `topics`/`topicsPattern` option; its
  * producer side is `writeStream.format("pulsar")` on the deduped
  * frame.
  */
trait FeedSource {
  /** Batch read: a DataFrame with a single string `line` column. */
  def read(spark: SparkSession): DataFrame

  /** Streaming read: same schema, as a streaming DataFrame. */
  def readStream(spark: SparkSession): DataFrame
}

/** Text files, one message per line (the integration-corpus format). */
final case class FileFeed(path: String) extends FeedSource {
  override def read(spark: SparkSession): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")
  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream.text(path).withColumnRenamed("value", "line")
}

/** Fixed in-memory lines — batch-only, for tests and backfills. */
final case class MemoryFeed(lines: Seq[String]) extends FeedSource {
  override def read(spark: SparkSession): DataFrame = {
    import spark.implicits._
    lines.toDF("line")
  }
  override def readStream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "MemoryFeed is batch-only; use MemoryStream[String] + parseLines for streaming tests")
}
