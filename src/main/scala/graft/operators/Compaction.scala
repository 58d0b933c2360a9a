package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the operational pass every long-running
  * ingest needs: a streaming/micro-batch writer (the reference's
  * per-block JSON sink shape, etl-rust `src/output/json.rs:45-63` —
  * literally one file per record) accumulates files far smaller than a
  * scan-efficient target, and a 100 TB table with 10⁸ tiny files is
  * unreadable (footer/open overhead dominates). Compaction rewrites a
  * directory to ⌈bytes / targetFileBytes⌉ files.
  *
  * Mechanics: size the input through the Hadoop FileSystem (no data
  * read), then rewrite with exactly that many output tasks. The
  * rewrite is a plain distributed scan→write — no shuffle when
  * reducing file count (coalesce), one range shuffle when also
  * re-sorting (compactSorted, which composes with ZOrder-style layout
  * so compaction and clustering are one pass, not two).
  */
object Compaction {

  /** Total bytes of data files under `dir` (direct children). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
  }

  /** File count a compaction of `dir` should produce. */
  def targetFiles(spark: SparkSession, dir: String, targetFileBytes: Long): Int =
    math.max(1, math.ceil(dataBytes(spark, dir).toDouble / targetFileBytes).toInt)

  /** Rewrite `srcDir` (parquet) into `destDir` with ~targetFileBytes
    * files. coalesce (not repartition): narrow dependency, no shuffle —
    * each output task concatenates a set of input files. The scan may
    * already pack small files below the target count
    * (spark.sql.files.maxPartitionBytes); coalesce only ever reduces,
    * so the result is ≤ the byte-derived target. */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val n = targetFiles(spark, srcDir, targetFileBytes)
    spark.read.parquet(srcDir).coalesce(n)
      .write.mode("overwrite").parquet(destDir)
    n
  }

  /** Compact AND cluster in one pass: range-partition on `sortCol` into
    * the byte-targeted file count, sort within files — the output is
    * both right-sized and skippable on `sortCol` (one shuffle). */
  def compactSorted(spark: SparkSession, srcDir: String, destDir: String,
      sortCol: String, targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val n = targetFiles(spark, srcDir, targetFileBytes)
    val df: DataFrame = spark.read.parquet(srcDir)
    df.repartitionByRange(n, df.col(sortCol))
      .sortWithinPartitions(df.col(sortCol))
      .write.mode("overwrite").parquet(destDir)
    n
  }
}
