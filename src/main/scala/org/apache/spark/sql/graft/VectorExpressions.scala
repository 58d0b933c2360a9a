// Lives under org.apache.spark.sql so the expressions can implement the
// private[sql] typing contract (AbstractDataType / ExpectsInputTypes) and
// bridge Expression <-> Column — the standard packaging for third-party
// native expressions; everything used is Spark's own extension surface.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.column
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The SQL-lambda formulation (`aggregate(zip_with(a, b, ...), ...)`)
  * allocates a zipped array and evaluates two lambdas per element in
  * interpreted mode — fine at 500 vectors, a bottleneck at 10⁹. These
  * expressions generate a tight primitive loop via `doGenCode` (the
  * preferred extension order from the build brief: native Expression >
  * UDF), keeping the whole projection inside whole-stage codegen with
  * zero boxing.
  *
  * Semantics are IDENTICAL to the lambda fold the DuckDB oracle mirrors:
  * sequential left-to-right double accumulation over the array order —
  * bit-for-bit the same result, so oracled queries can swap
  * implementations without value drift.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ over two float arrays, double accumulator. Null if either
    * side is null; mismatched lengths fold over the shorter (callers in
    * this engine always pass equal-length embeddings). */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatVectorDot =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σ aᵢ²) over a float array, double accumulator. */
  case class FloatVectorNorm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $x.numElements(); $i++) {
           |  double $v = (double) $x.getFloat($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): FloatVectorNorm =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def vecDot(a: Column, b: Column): Column = column(FloatVectorDot(expr(a), expr(b)))
  def vecNorm(a: Column): Column = column(FloatVectorNorm(expr(a)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
