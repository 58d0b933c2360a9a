package graft.operators

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Batch-mode checkpoint/resume — the high-watermark pattern.
  *
  * Re-expresses etl-rust `pick_up_from_previous_range`
  * (`src/main.rs:186-238`): a marker directory holds one file per
  * completed range, the filename being `<start>_<end>`; on restart the
  * requested range is narrowed past what is already done. Forward mode
  * advances `start` beyond the max completed endpoint; reverse mode pulls
  * `end` below the min completed start. A fully-consumed range is an
  * error (the reference panics).
  *
  * Streaming jobs don't need this — Structured Streaming's
  * `checkpointLocation` subsumes it (see graft.streaming); this is for
  * idempotent batch backfills, where the marker write happens AFTER the
  * output commit so replays are at-least-once over idempotent
  * (overwrite-by-partition) sinks.
  */
object HighWatermark {

  /** Narrow [start, end) past completed work recorded in `dir`.
    * @return (newStart, newEndOpt) — newEndOpt is Some(e) only in reverse
    *         mode, mirroring the reference's signature. */
  def resume(dir: Path, start: Long, end: Long, reverse: Boolean = false): (Long, Option[Long]) = {
    Files.createDirectories(dir)
    val ranges = completedRanges(dir)
    if (ranges.isEmpty) (start, if (reverse) Some(end) else None)
    else if (!reverse) {
      val done = ranges.map(_._2).max
      val s = math.max(start, done)
      require(s < end, s"range [$start,$end) already fully indexed (watermark $done)")
      (s, None)
    } else {
      val done = ranges.map(_._1).min
      val e = math.min(end, done)
      require(start < e, s"reverse range [$start,$end) already fully indexed (watermark $done)")
      (start, Some(e))
    }
  }

  /** Record [start, end) as completed. Call only after the sink commit. */
  def markDone(dir: Path, start: Long, end: Long): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"${start}_$end"), Array.emptyByteArray)
  }

  /** Parse marker filenames. Two accepted forms:
    *   - `<start>_<end>` (ours, end exclusive);
    *   - `<n>` — the reference's single-number `./indexed_blocks/` marker
    *     (`src/main.rs:203-231`: forward resumes at n+1, reverse ends at
    *     n−1 inclusive), which maps exactly to the range (n, n+1) here —
    *     so reference-written checkpoint dirs resume correctly.
    * Anything unparseable (including digit strings overflowing Long) is a
    * foreign file and is ignored, like the reference's scan. */
  private def completedRanges(dir: Path): Seq[(Long, Long)] = {
    def num(s: String): Option[Long] =
      if (s.nonEmpty && s.forall(_.isDigit)) scala.util.Try(s.toLong).toOption
      else None
    val stream = Files.list(dir)
    try
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .flatMap { n =>
          n.split("_") match {
            case Array(a, b) => for (x <- num(a); y <- num(b)) yield (x, y)
            case Array(a)    => num(a).map(x => (x, x + 1))
            case _           => None
          }
        }
        .toList
    finally stream.close()
  }
}
