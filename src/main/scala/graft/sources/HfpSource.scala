package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HFP message parsing — the reference's wire format
  * (hfp-5000.txt: `<recv_iso_ts> <mqtt_topic> <json_payload>` where
  * the topic is `/hfp/v1/<journey_type>/<temporal_type>/
  * <transport_mode>/<operator_id>/<vehicle_number>[/...]` and the
  * payload is `{"VP": {desi dir oper veh tst tsi spd hdg lat long
  * acc dl odo drst oday jrn line start}}`).
  *
  * All parsing is codegen'd built-ins: one split for the three
  * space-separated parts (payload JSON contains spaces → limit 3),
  * one split for the topic, from_json with an explicit schema for
  * the payload (schema-on-read, no sampling pass — mandatory at
  * 100 TB where schema inference would scan everything twice).
  */
object HfpSource {

  /** VP (vehicle position) payload schema, per the public HFP v1 format. */
  val vpSchema: StructType = StructType(Seq(
    StructField("desi", StringType), StructField("dir", StringType),
    StructField("oper", LongType), StructField("veh", LongType),
    StructField("tst", StringType), StructField("tsi", LongType),
    StructField("spd", DoubleType), StructField("hdg", LongType),
    StructField("lat", DoubleType), StructField("long", DoubleType),
    StructField("acc", DoubleType), StructField("dl", LongType),
    StructField("odo", DoubleType), StructField("drst", LongType),
    StructField("oday", StringType), StructField("jrn", LongType),
    StructField("line", LongType), StructField("start", StringType)))

  val payloadSchema: StructType = StructType(Seq(StructField("VP", vpSchema)))

  /** Parse a DataFrame with a single `line` string column of raw HFP
    * feed lines into typed columns. Defensive against wire garbage —
    * Spark 4's ANSI mode makes element_at/cast/to_timestamp THROW, so
    * a single blank or truncated line would otherwise kill the batch
    * job or permanently fail the streaming query (which re-reads the
    * same file on restart). Malformed lines are dropped; malformed
    * numeric/timestamp fields go null via try_* variants.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val parts = split(col("line"), " ", 3)
    def t(i: Int): Column = element_at(split(col("topic"), "/"), i)
    lines
      .filter(size(split(col("line"), " ", 3)) >= 3)
      .select(
        expr("try_to_timestamp(element_at(split(line, ' ', 3), 1))").as("recv_ts"),
        element_at(parts, 2).as("topic"),
        element_at(parts, 3).as("payload"))
      .filter(size(split(col("topic"), "/")) >= 8)
      .withColumn("vp", from_json(col("payload"), payloadSchema).getField("VP"))
      .select(
        col("recv_ts"),
        t(3).as("version"),
        t(4).as("journey_type"),
        t(5).as("temporal_type"),
        t(6).as("transport_mode"),
        t(7).try_cast("long").as("operator_id"),
        t(8).try_cast("long").as("vehicle_number"),
        col("vp.desi").as("desi"), col("vp.dir").as("dir"),
        col("vp.oper").as("oper"), col("vp.veh").as("veh"),
        expr("try_to_timestamp(vp.tst)").as("tst"), col("vp.tsi").as("tsi"),
        col("vp.spd").as("spd"), col("vp.hdg").as("hdg"),
        col("vp.lat").as("lat"), col("vp.long").as("lon"),
        col("vp.acc").as("acc"), col("vp.dl").as("dl"),
        col("vp.odo").as("odo"), col("vp.drst").as("drst"),
        col("vp.oday").as("oday"), col("vp.jrn").as("jrn"),
        col("vp.line").as("line"), col("vp.start").as("start"),
        col("payload"))
  }

  /** Content identity of an HFP message for dedup: the raw payload
    * bytes. Sensitive to JSON key order / whitespace — prefer
    * [[canonicalContentKey]], the analog of the reference's
    * re-serialization.
    */
  def contentKey: Column = col("payload")

  /** CANONICAL content identity: the payload re-serialized with
    * recursively sorted keys ([[graft.plans.CanonicalJson]]) — the
    * direct analog of the reference's protobuf
    * re-serialize-before-hash (Deduplicator.java:71-106, "the rawHash
    * differs in the order of bytes"). Two wire payloads that differ
    * only in JSON key order, whitespace, or numeric spelling ("8.50"
    * vs "8.5") canonicalize to one string, so delivery-side
    * formatting variance cannot defeat dedup; a MALFORMED payload
    * passes through verbatim and keeps its own identity (a
    * schema-projected re-serialization would collapse all garbage —
    * and any schema-external field — into one key and silently drop
    * real messages as duplicates).
    */
  def canonicalContentKey: Column = graft.plans.CanonicalJson(col("payload"))

  /** The reference's EXACT stored hash value: murmur3_128 with the
    * pinned seed 42 over the canonical payload bytes
    * (Deduplicator.java:27-28, 46 — the static seed exists precisely
    * so hashes can be shared with external storage). Byte-for-byte
    * Guava-compatible ([[graft.plans.Murmur3x64_128]]), so a graft
    * pipeline and the reference service can dedup against the SAME
    * external hash store.
    */
  def contentHash128: Column =
    graft.plans.Murmur3_128(canonicalContentKey.cast("binary"), 42)

  /** Per-schema canonicalizers for multi-schema feeds — the analog of
    * the reference's payload dispatch (Deduplicator.parsePayload,
    * Deduplicator.java:71-106): a message carries a schema tag; a
    * RECOGNIZED schema is canonicalized (protobuf re-serialize there,
    * sorted-key JSON re-serialize here) so byte-order variance can't
    * defeat dedup, and everything else — unknown schema, missing tag,
    * unparseable payload — passes through VERBATIM, exactly
    * `mappedData.orElse(sourceData)`. (The reference's schema filter
    * also admits PassengerCount but its parser throws for it, so
    * PassengerCount messages observably fall back to raw bytes too —
    * modeled here by simply not listing it.) Ordered Seq, not Map:
    * the dispatch must compile to one deterministic CASE WHEN.
    */
  val canonicalizers: Seq[(String, Column => Column)] = Seq(
    "mqtt-raw" -> (c => graft.plans.CanonicalJson(c)),
    "hfp" -> (c => graft.plans.CanonicalJson(c)))

  /** Schema-dispatched canonical content: CASE WHEN over the schema
    * tag, per-row map work (no shuffle, codegen'd children). The
    * CanonicalJson kernel already passes malformed input through
    * verbatim, so the parse-failure fallback needs no extra branch.
    */
  def canonicalPayload(schema: Column, payload: Column): Column =
    canonicalizers.foldRight(payload) { case ((tag, f), els) =>
      when(schema === lit(tag), f(payload)).otherwise(els)
    }

  /** Multi-schema feed frame → same frame plus the dedup content key
    * (`content_key`): one logical stream, several wire schemas, one
    * dedup — the reference's exact topology.
    */
  def withContentKey(df: DataFrame, schemaCol: String = "schema",
                     payloadCol: String = "payload"): DataFrame =
    df.withColumn("content_key", canonicalPayload(col(schemaCol), col(payloadCol)))

  /** Batch read of an HFP text feed (one message per line). */
  def readFeed(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    readVia(spark, FileFeed(path))

  /** Streaming read of an HFP text feed directory — the file-source
    * analog of the reference's Pulsar consumer (new files = new
    * messages; downstream dedup/analytics are identical).
    */
  def readFeedStream(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    readStreamVia(spark, FileFeed(path))

  /** Parse any [[FeedSource]] (batch). */
  def readVia(spark: org.apache.spark.sql.SparkSession, src: FeedSource): DataFrame =
    parseLines(src.read(spark))

  /** Parse any [[FeedSource]] (streaming). */
  def readStreamVia(spark: org.apache.spark.sql.SparkSession, src: FeedSource): DataFrame =
    parseLines(src.readStream(spark))
}
