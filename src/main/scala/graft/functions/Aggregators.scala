package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF surface of SURVEY.md §2.2).
  *
  * ModProduct: modular product Π x mod p — an aggregate Spark has no
  * built-in for, exact in integer arithmetic (so DuckDB can oracle it via
  * list_reduce), commutative/associative (so partial aggregation and
  * merge order don't change the result — safe under Spark's partial/final
  * split, which is the property a correct Aggregator must have).
  */
object Aggregators {
  val ModP = 1000000007L

  object ModProduct extends Aggregator[Long, Long, Long] {
    override def zero: Long = 1L
    override def reduce(b: Long, a: Long): Long = {
      val x = ((a % ModP) + ModP) % ModP // normalize negatives
      java.lang.Math.floorMod(b * x, ModP)
    }
    override def merge(b1: Long, b2: Long): Long = java.lang.Math.floorMod(b1 * b2, ModP)
    override def finish(reduction: Long): Long = reduction
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
