package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-prefiltered incremental dedup — the runtime-filter
  * rendering of [[NearDup.dedupIncremental]]'s batch-vs-history
  * check for the case where history is the 100 TB side.
  *
  * The result is EXACT (identical to the plain manifest join): the
  * bloom only prunes batch rows that provably have no history match;
  * false positives survive the prefilter and are then settled by an
  * exact hash join. What changes is the data movement:
  *
  *  1. one map-combinable [[BloomFilterAggregate]] pass over history
  *     builds a fixed-size bit-array sketch (Spark's own runtime-
  *     filter aggregate — partials OR together, shuffle carries one
  *     sketch per partition, never a row);
  *  2. the sketch travels to the batch scan as a literal (the same
  *     broadcast-a-bounded-sketch posture as the IVF centroids; size
  *     it from the history manifest's row-count metadata — 8 bits/key
  *     ≈ 2% fpp, so a 10¹⁰-key history is a ~10 GB sketch, sharded in
  *     production exactly like Spark's InjectRuntimeFilter does);
  *  3. only the `might_contain` survivors (true dups + the fpp tail)
  *     form the candidate key set, which is small enough to BROADCAST
  *     into a left-semi probe of history — history is scanned
  *     map-only and NEVER shuffled, the property that matters when
  *     history is 1000× the batch;
  *  4. the confirmed dup keys (≤ candidate set, also broadcast) flag
  *     the batch rows.
  *
  * Reference anchor: the store-lookup-before-ingest contract of
  * Deduplicator.java:43-59, with the bloom standing in for the "has
  * this key possibly been seen" fast path an external cache serves.
  */
object BloomDedup {

  /** Bits in the history sketch (1 MiB). At the test corpus's ≤ 10⁴
    * history keys this is ≪ 1% fpp; production sizes it from the
    * manifest row count instead of a constant.
    */
  val BLOOM_BITS = 8L * 1024 * 1024

  private[graft] def bloomAggColumn(child: Column, numBits: Long): Column =
    GraftShim.column(new BloomFilterAggregate(
      GraftShim.expression(child),
      Literal(numBits / 16), // estimated items consistent with bits
      Literal(numBits)).toAggregateExpression())

  private[graft] def mightContain(bloom: Array[Byte], child: Column): Column =
    GraftShim.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftShim.expression(child)))

  /** Build the serialized history sketch over a 64-bit key column —
    * one map-combinable pass; null when `keys` is empty.
    */
  private[graft] def buildSketch(keys: DataFrame, key: Column,
                                 numBits: Long = BLOOM_BITS): Array[Byte] =
    keys.agg(bloomAggColumn(key, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Batch docs (doc_id % 5 == 0, as in dedupIncremental) flagged
    * against history through the bloom prefilter. Output is exact —
    * (doc_id, content_hash, dup_of_history) matches the plain join.
    */
  def dedupBloom(spark: SparkSession, dir: String): DataFrame = {
    // narrow (id, hash) frame computed once for both splits (the
    // history side feeds aggregates/broadcasts — no exchange reuse
    // across those boundaries, same rationale as dedupIncremental)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("content_hash"),
        xxhash64(col("text")).as("h64"))
      .localCheckpoint(eager = false)
    val history = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = d.filter(pmod(col("doc_id"), lit(5)) === 0)

    val sketch = buildSketch(history, col("h64"))
    val candidates =
      if (sketch == null) batch.filter(lit(false)) // empty history
      else batch.filter(mightContain(sketch, col("h64")))

    // candidate keys broadcast INTO the history scan: history is
    // probed map-only (left-semi against the broadcast set) and its
    // rows never enter a shuffle
    val dupKeys = history.select("content_hash")
      .join(broadcast(candidates.select("content_hash").distinct()),
        Seq("content_hash"), "leftsemi")
      .distinct()
      .withColumn("dup", lit(true))

    batch.join(broadcast(dupKeys), Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        coalesce(col("dup"), lit(false)).as("dup_of_history"))
  }
}
