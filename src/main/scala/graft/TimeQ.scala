package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bench-comparable timings need Bench's warm-up policy: one pass at a
    // DIFFERENT (tiny) dir removes janino codegen + JIT + classloading
    // latency while leaving the timed dir's per-(session,dir) memos cold.
    // Opt out with SPARK_GRAFT_WARM_DIR=none for true cold-JVM numbers.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      if (warmDir != "none")
        try SparkEntry.queries(name)(spark, warmDir).count()
        catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMED $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
