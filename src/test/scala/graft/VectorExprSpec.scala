package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_dot/vec_norm match the SQL-lambda double fold bit-for-bit") {
    val e = Tables.embeddings(spark, TestSpark.sfDir).limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(
        vecDot(col("a.embedding"), col("b.embedding")).as("native"),
        TextFunctions.dotDouble("a.embedding", "b.embedding").as("lambda"),
        vecNorm(col("a.embedding")).as("native_norm"),
        TextFunctions.normDouble("a.embedding").as("lambda_norm"))
    // bit-exact: the generated loop folds in the same order as the lambda
    assert(both.filter(col("native") =!= col("lambda")).count() === 0)
    assert(both.filter(col("native_norm") =!= col("lambda_norm")).count() === 0)
  }

  test("expressions participate in codegen (no CodegenFallback)") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val df = e.select(vecDot(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("* Project"), p) // the vec_dot projection is codegen'd
  }

  test("GraftExtensions exposes vec_dot/vec_norm to SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      val r = s2.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
        .head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 5.0)
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
