package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.VectorExpressions.{FloatVectorDot, FloatVectorNorm}

/** Engine extensions: registers the native vector expressions as SQL
  * functions (`vec_dot`, `vec_norm`) so the SQL surface reaches them too.
  *
  * Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * sanctioned injection point for third-party Catalyst work (the build
  * brief's extension ladder: built-in ops > native Expression >> UDF).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot(a, b) takes two float arrays")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVectorNorm].getName, "vec_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "vec_norm(a) takes one float array")
        FloatVectorNorm(children.head)
      }))
  }
}
