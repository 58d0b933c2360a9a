package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the engine API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.LlmQueries.q20DedupMinhash(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    df.count()
    println(f"[scratch] q20 ${(System.nanoTime()-t0)/1e9}%.2f s")
    val plan = df.queryExecution.executedPlan.toString
    println("[scratch] Reused* count: " + "Reused".r.findAllIn(plan).length)
    println("[scratch] TableCacheQueryStage: " + "TableCache".r.findAllIn(plan).length)
    println("[scratch] Exchange count: " + "Exchange".r.findAllIn(plan).length)
    println("[scratch] FileScan count: " + "FileScan".r.findAllIn(plan).length)
    spark.stop()
  }
}
