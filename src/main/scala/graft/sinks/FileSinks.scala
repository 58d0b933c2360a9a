package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File sinks (etl-rust K5–K7) as declarative Spark writes.
  *
  * K5 (`json.rs:22-63`): one JSON doc per record under
  * OUTPUT_DIR/<subdir>/ — `df.write.json` (task files replace the
  * reference's per-record unique-name loop, whose never-clobber intent is
  * subsumed by Spark's task-attempt commit protocol — C2).
  *
  * K6 (`jsonl.rs:40-89`): append-mode JSONL batches, empty batches
  * skipped — mode("append") + an isEmpty guard.
  *
  * K7 (`gcs.rs:57-191`): the hand-rolled date/hour/half-hour bucketing of
  * an ascending-timestamp batch IS `write.partitionBy` over derived
  * bucket columns — order-independent (semantic upgrade noted in
  * SURVEY.md §7) and partition-prunable on read.
  */
object FileSinks {

  /** K5/K6: JSON-lines write; append semantics, empty batch skipped. */
  def writeJsonl(df: DataFrame, outDir: String, subdir: String): Unit =
    if (!df.isEmpty) df.write.mode("append").json(s"$outDir/$subdir")

  /** SINGLE_PUBLISHER envelope write (`single_stream_publisher.rs:12-31`):
    * records of ALL tables append into one queue dir, each wrapped as
    * `{table, payload}` with the record serialized opaquely — the shape a
    * single multiplexed queue forces (routing key + payload bytes). */
  def writeJsonlMerged(df: DataFrame, outDir: String, queue: String, table: String): Unit =
    if (!df.isEmpty)
      df.select(lit(table).as("table"),
          to_json(struct(df.columns.map(col).toSeq: _*)).as("payload"))
        .write.mode("append").json(s"$outDir/$queue")

  /** K7: time-partitioned write with the reference's exact bucket scheme:
    * date / hour / half-hour-flag (minute < 30 → 0, else 30;
    * gcs.rs:96-115). Partition values become directories, so reads prune
    * by date/hour without touching data. */
  def writeTimePartitioned(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("p_hour", hour(col(tsCol)))
      .withColumn("p_half", when(minute(col(tsCol)) < 30, 0).otherwise(30))
      .write.mode("overwrite")
      .partitionBy("p_date", "p_hour", "p_half")
      .json(outDir)

  /** C8: golden-fixture generator (save-range / create-test-set,
    * `src/main.rs:434-462`) — extract → transform → parquet goldens named
    * `<name>_<start>_<end>`. */
  def writeGolden(df: DataFrame, goldenRoot: String, name: String, start: Long, end: Long): Unit =
    df.write.mode("overwrite").parquet(s"$goldenRoot/${name}_${start}_$end")
}
