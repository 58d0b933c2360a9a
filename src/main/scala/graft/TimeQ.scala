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
    // Per-query peak HEAP usage (sum over heap pools, reset before the
    // timed run): the state-store A/B's memory telemetry — RocksDB keeps
    // streaming state off-heap, so its q222/q92 peaks should sit BELOW
    // the HDFSBackedStateStore's at the same scale.
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    for (name <- args) {
      if (warmDir != "none")
        try SparkEntry.queries(name)(spark, warmDir).count()
        catch { case _: Throwable => () }
      heapPools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val peakGb = heapPools.map(_.getPeakUsage.getUsed).sum / 1e9
      println(f"TIMED $name ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows, peak_heap ${peakGb}%.2f GB)")
    }
    spark.stop()
  }
}
