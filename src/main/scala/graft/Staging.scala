package graft

import org.apache.spark.sql.DataFrame

/** Staged-directory hygiene for round-trip queries (q69/q74/q79/q82/
  * q84): a query that writes a temp layout and re-reads it must
  * materialize its (small, bounded) final aggregate BEFORE deleting the
  * staging dir — DataFrames are lazy, so returning the plan directly
  * would read from files the caller may outlive. Centralizing the
  * collect+cleanup also guarantees bench warm-up + timed runs never
  * accumulate temp dirs (the round-2 advisory leak class). */
object Staging {

  /** Recursively delete a local staging directory. */
  def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** Collect `out` (must be a small final aggregate), delete `tmpDir`,
    * and return the rows re-wrapped as a local DataFrame with the same
    * schema. */
  def materializeThenDelete(out: DataFrame, tmpDir: String): DataFrame = {
    val schema = out.schema
    val rows = java.util.Arrays.asList(out.collect(): _*)
    deleteRecursively(tmpDir)
    out.sparkSession.createDataFrame(rows, schema)
  }
}
