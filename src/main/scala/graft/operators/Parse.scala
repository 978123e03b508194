package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Message parsing (SURVEY.md §2.2) — the HFP data-model analog.
  *
  * The reference consumes messages whose identity is an MQTT topic
  * path plus a JSON payload (hfp-5000.txt:
  * `/hfp/v1/<type>/<state>/<mode>/... {"VP":{...}}`). The analog here:
  * `events.props` is the JSON payload; a path-shaped key is derived
  * and re-parsed to show topic decomposition. All parsing is
  * codegen'd built-ins (get_json_object / split) — no UDFs.
  */
object Parse {

  /** JSON payload field extraction + aggregate over the parsed field. */
  def parsePropsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket", pmod(col("k"), lit(10L)))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))

  /** Build an HFP-style topic path, then decompose it back into typed
    * columns with split() — the topic-parsing shape of the reference.
    */
  def parseTopic(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("topic",
        concat_ws("/", lit(""), lit("hfp"), lit("v1"), col("event_type"), col("user_id")))
      .withColumn("parts", split(col("topic"), "/"))
      .select(
        col("event_id"),
        element_at(col("parts"), 4).as("topic_type"),
        element_at(col("parts"), 5).cast("long").as("topic_user"))
      .groupBy("topic_type")
      .agg(count(lit(1)).as("n"), sum("topic_user").cast("long").as("sum_user"))
}
