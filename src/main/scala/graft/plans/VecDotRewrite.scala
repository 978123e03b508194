package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product with EXACTLY the semantics of the declarative
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  * pattern: null when the arrays differ in length (zip_with pads the
  * shorter side with nulls, which nulls the whole sum) or when any
  * element pair contains a null — otherwise a sequential double fold.
  * This is what [[VecDotRewrite]] substitutes for the HOF tree; it
  * must be bit-identical INCLUDING the null cases, which the
  * prefix-tolerant [[VecDot]] deliberately is not.
  */
case class VecDotStrict(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_strict needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, e: Expression, i: String) =
      if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${getter(a, left, i)} * ${getter(b, right, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotStrict =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: rewrite the declarative higher-order dot-product
  * pattern into the codegen'd [[VecDotStrict]] kernel.
  *
  * Higher-order Column lambdas are interpreted per element (lambda
  * dispatch + boxing — measured ~30× slower than the loop kernel,
  * see [[VecDot]]), so users writing the natural
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  * pay that tax silently. This rule recognizes exactly that tree —
  * double-typed multiply of the two lambda variables (either order,
  * through explicit double casts), literal 0.0 seed, pure
  * `acc + v` merge, identity finish — and substitutes the kernel.
  * Guards that make it semantics-preserving, not just plausible:
  *
  *  - the multiply must already be DOUBLE-typed: a float×float
  *    lambda does float arithmetic, which the double kernel would
  *    not reproduce bit-for-bit, so it is left alone;
  *  - [[VecDotStrict]] nulls on length mismatch and null elements,
  *    exactly like the zip_with/aggregate tree (the prefix-tolerant
  *    VecDot would differ there).
  *
  * Installed at session-build time via [[GraftExtensions]]
  * (injectOptimizerRule) or on a live session via
  * [[GraftFunctions.installOptimizations]]
  * (experimental.extraOptimizations).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  /** The lambda variable itself, or an explicit widening to double. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  private def sameVar(a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    a.exprId == b.exprId

  private def okArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Multiply operands are the two zip lambda vars (either order). */
  private def mulMatches(ma: Expression, mb: Expression,
                         x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (asVar(ma), asVar(mb)) match {
      case (Some(va), Some(vb)) =>
        (sameVar(va, x) && sameVar(vb, y)) || (sameVar(va, y) && sameVar(vb, x))
      case _ => false
    }

  /** Merge body is exactly `acc + v` (either order). */
  private def addMatches(aa: Expression, ab: Expression,
                         acc: NamedLambdaVariable, el: NamedLambdaVariable): Boolean =
    (aa, ab) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (sameVar(a, acc) && sameVar(b, el)) || (sameVar(a, el) && sameVar(b, acc))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(mul @ Multiply(ma, mb, _), Seq(
          x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(aa, ab, _), Seq(
          acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
      if mul.dataType == DoubleType && okArray(l) && okArray(r) &&
        sameVar(fin, fv) && mulMatches(ma, mb, x, y) && addMatches(aa, ab, acc, el) =>
      VecDotStrict(l, r)
  }
}
