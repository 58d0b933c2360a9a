// Same packaging rationale as VectorExpressions: private[sql] typing
// contract + Expression <-> Column bridge.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils.column
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native borsh codec expressions (see [[graft.functions.Borsh]] for
  * the format). Both directions are single static calls inside
  * whole-stage codegen; the decoder returns a typed STRUCT, so
  * downstream field access (`dec.fee`) is ordinary catalyst projection
  * with column pruning — no JSON intermediary, no UDF. */
object BorshExpressions {

  val txRecordType: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("tx_index", LongType, nullable = false),
    StructField("fee", LongType, nullable = false),
    StructField("tx_hash", StringType, nullable = false)))

  case class BorshEncodeTx(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
      extends QuaternaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(LongType, LongType, LongType, StringType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "borsh_encode_tx"

    override protected def nullSafeEval(bn: Any, txi: Any, fee: Any, hash: Any): Any =
      graft.functions.Borsh.encodeTx(
        bn.asInstanceOf[Long], txi.asInstanceOf[Long], fee.asInstanceOf[Long],
        hash.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bn, txi, fee, hash) =>
        s"${ev.value} = graft.functions.Borsh.encodeTx($bn, $txi, $fee, $hash.getBytes());")

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression, newFourth: Expression): BorshEncodeTx =
      copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
  }

  case class BorshDecodeTx(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = txRecordType
    override def prettyName: String = "borsh_decode_tx"

    override protected def nullSafeEval(bytes: Any): Any =
      graft.functions.Borsh.decodeTxRow(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes =>
        s"${ev.value} = graft.functions.Borsh.decodeTxRow($bytes);")

    override protected def withNewChildInternal(newChild: Expression): BorshDecodeTx =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def borshEncodeTx(bn: Column, txi: Column, fee: Column, hash: Column): Column =
    column(BorshEncodeTx(expr(bn), expr(txi), expr(fee), expr(hash)))

  def borshDecodeTx(bytes: Column): Column = column(BorshDecodeTx(expr(bytes)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
