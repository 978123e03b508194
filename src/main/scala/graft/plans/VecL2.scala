package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._

/** Exact squared-L2 distance over two `array<bigint>` columns —
  * Σᵢ (aᵢ − bᵢ)² in pure int64, the distance kernel of the
  * fixed-point k-means family (grid-quantized vectors, so the value
  * is engine-exact with no float anywhere).
  *
  * This replaces `aggregate(zip_with(xs, ms, (a,b) -> (a-b)*(a-b)),
  * 0, +)` in the Lloyd hot path: higher-order Column functions are
  * interpreted per element (lambda-variable dispatch + an
  * intermediate array from zip_with), which puts an O(k·d)
  * interpreted walk on EVERY vector per training round. Here it is a
  * primitive long loop: whole-stage codegen when the expression sits
  * in a projection, and a tight JVM loop via [[nullSafeEval]] when it
  * is evaluated inside a higher-order lambda body (HOF bodies always
  * interpret their expression tree — a flat custom kernel keeps that
  * interpretation one call deep instead of per-element).
  *
  * Semantics match the HOF rendering on the engine's contract inputs
  * (equal-length, non-null elements): unequal lengths use the
  * shorter prefix; null elements contribute 0.
  */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq needs array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecL2Sq {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(VecL2Sq(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Grid quantization of a numeric vector — floor(eᵢ · scale) as
  * int64 per element, the `transform(embedding, e -> CAST(floor(
  * CAST(e AS DOUBLE) * scale) AS BIGINT))` rendering as ONE eval
  * call per row instead of an interpreted lambda per ELEMENT
  * (float→double is exact, so the value is identical). Null elements
  * stay null, exactly like the HOF's CAST-of-null. Non-finite
  * elements and values whose floor falls outside int64 THROW, exactly
  * like the ANSI CAST they replace would (embeddings are external
  * input per the project ANSI-guard rule — a silent 0 for NaN would
  * diverge from both the HOF rendering and the DuckDB oracle).
  * CodegenFallback is fine: the cost model here is calls-per-row, and
  * the fallback is one virtual call wrapping a tight primitive loop
  * (the WordShingles adjudication).
  */
case class VecFloorScale(child: Expression, scale: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_floor_scale needs an array<float|double> input, got $other")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val f = math.floor(v * scale)
        // ANSI-cast parity: NaN/Inf and long-overflowing values throw
        // rather than silently yielding 0 / saturating. The upper
        // bound is Long.MaxValue rounded UP to a double, so >= is the
        // exact first unrepresentable floor value.
        if (java.lang.Double.isNaN(f) || f < -9.223372036854776e18 || f >= 9.223372036854776e18)
          throw new ArithmeticException(
            s"vec_floor_scale: value $v * $scale is not representable as BIGINT (ANSI cast semantics)")
        out(i) = f.toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): VecFloorScale =
    copy(child = newChild)
}

object VecFloorScale {
  /** Column-API entry point. */
  def apply(a: Column, scale: Int): Column =
    GraftShim.column(VecFloorScale(GraftShim.expression(a), scale))
}
