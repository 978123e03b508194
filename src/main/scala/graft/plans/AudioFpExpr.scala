package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._

/** Catalyst expression: audio_fp(binary) → array<int> of the four
  * 16-bit bands of the chromaprint-shaped audio fingerprint
  * ([[graft.operators.Multimodal.audioFpBands]] is the single shared
  * kernel — 64 sign-of-delta bits over 65 proportional block
  * energies). Same structure as [[BlockHash]]: the hot loop is a
  * static JVM method, codegen emits a direct call, and the
  * expression stays inside whole-stage codegen.
  */
case class AudioFpExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_fp needs a binary input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    AudioFpExpr.bands(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AudioFpExpr.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioFpExpr =
    copy(child = newChild)
}

object AudioFpExpr {
  /** Static kernel entry point shared by eval and generated code. */
  def bands(payload: Array[Byte]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.operators.Multimodal.audioFpBands(payload))

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftShim.column(AudioFpExpr(GraftShim.expression(c)))
}
