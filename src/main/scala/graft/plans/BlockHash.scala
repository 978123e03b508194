package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._

/** Catalyst expression: block_hash(binary) → array<int> of the four
  * 16-bit bands of the blockhash perceptual fingerprint
  * ([[graft.operators.Multimodal.blockhash]] is the single shared
  * kernel — one definition serves the typed Dataset API, the Column
  * API, and SQL text). The hot loop is a static JVM method; codegen
  * emits a direct call, so the expression stays inside whole-stage
  * codegen like `murmur3_128`.
  */
case class BlockHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"block_hash needs a binary input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BlockHash.bands(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BlockHash.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): BlockHash =
    copy(child = newChild)
}

object BlockHash {
  /** Static kernel entry point shared by eval and generated code. */
  def bands(payload: Array[Byte]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.operators.Multimodal.blockhash(payload))

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftShim.column(BlockHash(GraftShim.expression(c)))
}
