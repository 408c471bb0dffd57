/** Bridge package: lives under org.apache.spark.sql so our library can reach
  * the `private[sql]` seams every third-party Spark extension needs —
  * Expression <-> Column conversion and `AbstractDataType` for input-type
  * coercion. Nothing here touches Spark internals beyond those two.
  */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `zorder64(a, b)` — native Catalyst expression computing the 64-bit Morton
  * interleave of two int32 keys. Codegen emits one static call to
  * [[graft.functions.Morton.interleave]] so the clustering-key computation
  * stays inside whole-stage codegen (north rule: 64-bit key interleave).
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.Morton.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Morton.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}
