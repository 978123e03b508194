package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema-evolution ingest for multi-generation parquet corpora — the
  * operational reality of a 100 TB lake: files written months apart
  * carry different column sets (a `lang` tag added in gen 2, a debug
  * column dropped in gen 3), and every reader still has to see ONE
  * stable contract schema. The reference sidesteps this by re-reading
  * a live bus; a storage-first engine cannot.
  *
  * Batch: `mergeSchema=true` unions the footers (added columns
  * surface; files that predate a column yield nulls for it — the
  * parquet reader's missing-column semantics), then [[conform]] locks
  * the result to the EXPECTED schema: missing columns materialize as
  * typed nulls, unexpected extras are dropped, every kept column is
  * cast to its contract type. Casts run under ANSI, so only widening
  * (or identity) conversions are safe — a narrowing contract change
  * throws on the first out-of-range row instead of silently
  * truncating, which is the correct failure for a contract violation.
  *
  * Streaming: parquet `readStream` REQUIRES a user schema, which is
  * exactly the contract schema — files missing a requested column
  * yield nulls via the same clipping, so old-generation files landing
  * in a watched directory never wedge the stream.
  *
  * Scale note: `mergeSchema` reads every file footer (a driver-side
  * listing+merge pass) — O(files), not O(bytes); with contract-pinned
  * readers ([[conform]] after a plain read, or the streaming path) the
  * footer sweep is skipped entirely. Column pruning still reaches the
  * scan either way: conform is a `select`, so unused contract columns
  * prune as usual.
  */
object EvolvingParquet {

  /** Batch read across schema generations, conformed to `expected`. */
  def read(spark: SparkSession, path: String, expected: StructType): DataFrame =
    conform(spark.read.option("mergeSchema", "true").parquet(path), expected)

  /** Streaming read of a watched directory under the contract schema;
    * old-generation files conform via parquet's missing-column nulls.
    */
  def readStream(spark: SparkSession, path: String, expected: StructType): DataFrame =
    spark.readStream.schema(expected).parquet(path)

  /** Lock `df` to the contract: expected column order and types,
    * typed nulls for columns `df` lacks, extras dropped, ANSI
    * (widen-only) casts for the rest. Name matching is
    * CASE-INSENSITIVE like Spark's own default resolution
    * (`spark.sql.caseSensitive=false`) — a generation written as
    * `Lang` still conforms to a `lang` contract instead of being
    * silently nulled.
    */
  def conform(df: DataFrame, expected: StructType): DataFrame = {
    // two input columns differing only by case (possible after
    // mergeSchema over case-sensitively written generations) would
    // silently resolve to whichever the map kept last — and
    // col(actual) could then throw an ambiguous-reference error far
    // from the cause; fail HERE with the colliding names instead
    val collisions = df.schema.fieldNames
      .groupBy(_.toLowerCase(java.util.Locale.ROOT)).filter(_._2.length > 1)
    require(collisions.isEmpty,
      s"conform: case-colliding input columns ${collisions.values.map(_.mkString("/")).mkString(", ")} — " +
        "disambiguate (rename/drop) before conforming to the contract schema")
    val have = df.schema.fieldNames.map(n => n.toLowerCase(java.util.Locale.ROOT) -> n).toMap
    val cols = expected.fields.map { f =>
      have.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(actual) => col(actual).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
