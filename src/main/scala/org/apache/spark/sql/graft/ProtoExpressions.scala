// Same packaging rationale as VectorExpressions: private[sql] typing
// contract + Expression <-> Column bridge.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils.column
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression wrapping [[graft.functions.Proto3.encodeTx]] — the
  * T5 record-serialization slot (reference wire format; see Proto3 doc).
  * The generated code is a single static call, so the projection stays
  * inside whole-stage codegen and the encoder allocates exactly one
  * right-sized byte array per record. */
object ProtoExpressions {

  case class ProtoEncodeTx(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends QuaternaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(LongType, LongType, LongType, StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "proto_encode_tx"

    override protected def nullSafeEval(bn: Any, txi: Any, fee: Any, hash: Any): Any =
      graft.functions.Proto3.encodeTx(
        bn.asInstanceOf[Long], txi.asInstanceOf[Long], fee.asInstanceOf[Long],
        hash.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bn, txi, fee, hash) =>
        s"${ev.value} = graft.functions.Proto3.encodeTx($bn, $txi, $fee, $hash.getBytes());")

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression, newFourth: Expression): ProtoEncodeTx =
      copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
  }

  /** Column-API entry point. */
  def protoEncodeTx(bn: Column, txi: Column, fee: Column, hash: Column): Column =
    column(ProtoEncodeTx(expr(bn), expr(txi), expr(fee), expr(hash)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
