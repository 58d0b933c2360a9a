package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the engine API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensOf(col("text")).as("toks"))
      .withColumn("shingles", shingles3("toks"))
      .withColumn("sz", size(col("shingles")))
    time("shingled count")(docs.count())
    time("shingled count 2nd")(docs.count())
    val inv = docs.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sg"))
      .select(col("doc_id"), col("sz"), xxhash64(col("sg")).as("hg"))
    time("inverted count")(inv.count())
    val joined = inv.as("x").join(inv.as("y"),
      col("x.hg") === col("y.hg") && col("x.doc_id") < col("y.doc_id"))
    time("join count")(joined.count())
    val agg = joined.groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sz").as("na"), col("y.sz").as("nb"))
      .agg(count(lit(1)).as("inter"))
    time("agg count")(agg.count())
    val q21 = graft.queries.LlmQueries.q21DedupNgramJaccard(spark, dir)
    time("full q21")(q21.count())
    q21.explain("formatted")
    spark.stop()
  }
}
