package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end cleaning-pipeline composition — the three passes every
  * training-data build chains, in ONE declarative plan so Catalyst
  * sees (and prunes/pushes through) the whole thing:
  *
  *   quality gate ([[TextAnalysis.docsQualityFilter]] keep verdict)
  *     → exact dedup (md5 content groups, min-doc_id survivor —
  *       first-wins, the reference's prime contract)
  *     → sequence packing ([[Sampling.docsPack]] running-sum cut).
  *
  * The value of composing operators as DataFrames instead of
  * materializing between passes: the dedup window only shuffles docs
  * that SURVIVED the gate, and packing only scans dedup survivors —
  * each stage's selectivity multiplies down the data the next stage
  * moves, with no intermediate storage round-trip. All decision
  * arithmetic is the underlying operators' (integer cross-multiplied
  * flags, exact hash groups, integer running sums), so the whole
  * pipeline stays engine-replayable end to end.
  */
object Pipeline {

  def docsPipeline(spark: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    val keep = TextAnalysis.docsQualityFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
    val kept = Tables.documents(spark, dir)
      .join(keep, "doc_id")
      .select(col("doc_id"), col("lang"), md5(col("text")).as("content_hash"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val dw = Window.partitionBy("content_hash").orderBy("doc_id")
    val survivors = kept
      .withColumn("rn", row_number().over(dw))
      .filter(col("rn") === 1)
    val pw = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survivors
      .withColumn("cum_tok", sum("n_tok").over(pw))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        expr(s"(cum_tok - n_tok) div $budget").as("pack_id"),
        pmod(col("cum_tok") - col("n_tok"), lit(budget.toLong)).as("pack_offset"))
  }
}
