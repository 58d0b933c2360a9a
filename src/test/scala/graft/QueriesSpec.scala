package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level spec over the full query registry at sf0.001: every
  * registered query must run and the flagship must return rows. The
  * value-level gate is the driver's DuckDB compare (scripts/
  * compare_oracle.py); this spec catches schema/runtime regressions in
  * `sbt test` without needing DuckDB. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, TestSpark.sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }
}
