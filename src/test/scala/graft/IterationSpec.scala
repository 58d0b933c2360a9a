package graft

import graft.operators.Iteration
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Round-frame lifecycle (round-11 verdict item 1): iteration frames must
  * be (a) stored serialized + disk-backed, so constrained-heap eviction
  * degrades to a disk read of a COMPACT block instead of inflating
  * storage with per-row object overhead, and (b) releasable the moment a
  * loop proves them dead — Dataset.unpersist is a CacheManager call that
  * silently frees nothing for a localCheckpointed frame, which is exactly
  * how round 11's 8 GiB sf10 run accumulated 8+ stale frames per peel. */
class IterationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def persistedCkptRdds(): Map[Int, StorageLevel] =
    spark.sparkContext.getPersistentRDDs.toMap.map { case (id, rdd) =>
      id -> rdd.getStorageLevel
    }

  test("ckpt stores frames serialized and disk-backed (MEMORY_AND_DISK_SER)") {
    val before = persistedCkptRdds().keySet
    val frame = Iteration.ckpt(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("x")))
    assert(frame.count() == 1000)
    val added = persistedCkptRdds().filter { case (id, _) => !before.contains(id) }
    assert(added.nonEmpty, "ckpt must register a persisted RDD")
    // localCheckpoint transforms the level to guarantee useDisk; the
    // serialized (deserialized=false) + memory bits must survive it
    added.values.foreach { lvl =>
      assert(lvl.useDisk, s"frame level $lvl must be disk-backed")
      assert(lvl.useMemory, s"frame level $lvl must be memory-first")
      assert(!lvl.deserialized, s"frame level $lvl must be serialized")
    }
    Iteration.release(frame)
  }

  test("release frees a dead frame's blocks immediately (not at GC time)") {
    val before = persistedCkptRdds().keySet
    val frame = Iteration.ckpt(spark.range(0, 100).toDF("v"))
    assert(frame.count() == 100)
    val added = persistedCkptRdds().keySet -- before
    assert(added.nonEmpty)
    Iteration.release(frame)
    // unpersist(blocking=false) marks the RDD unpersisted synchronously
    // (block removal is async); getPersistentRDDs drops it right away
    val after = persistedCkptRdds().keySet
    assert(added.forall(!after.contains(_)),
      s"released frame RDDs $added still registered: $after")
  }

  test("a released frame is gone but a live successor built FROM it still reads") {
    val a = Iteration.ckpt(spark.range(0, 50).toDF("v"))
    val b = Iteration.ckpt(a.select((col("v") + 1).as("v"))) // eager: b stored now
    Iteration.release(a)
    assert(b.agg(sum(col("v"))).head().getLong(0) == (1L to 50L).sum)
    Iteration.release(b)
  }

  test("observedOr reads convergence metrics from the ckpt job itself") {
    // the r14 round fusion: a loop's convergence aggregate rides the
    // frame's own materialization (observe → ckpt) — this pins that the
    // eager localCheckpoint action DELIVERS the observed metrics, i.e.
    // the fused path is real and the fallback job is never paid
    val obs = org.apache.spark.sql.Observation()
    val frame = Iteration.ckpt(
      spark.range(0, 100).toDF("u")
        .observe(obs, count(lit(1)).as("n"), sum(col("u")).as("s")))
    var fellBack = false
    val m = Iteration.observedOr(obs) {
      fellBack = true; Map("n" -> -1L, "s" -> -1L)
    }
    assert(m("n") === 100L)
    assert(m("s") === (0L until 100L).sum)
    assert(!fellBack,
      "metrics must arrive from the localCheckpoint action, not the fallback job")
    Iteration.release(frame)
  }

  test("release on a loop: only the final frame stays persisted") {
    val before = persistedCkptRdds().keySet
    var cur = Iteration.ckpt(spark.range(0, 200).toDF("v"))
    for (_ <- 1 to 4) {
      val next = Iteration.ckpt(cur.select((col("v") + 1).as("v")))
      Iteration.release(cur)
      cur = next
    }
    assert(cur.count() == 200)
    val live = persistedCkptRdds().keySet -- before
    // exactly the final frame's RDD(s) remain — a bound independent of
    // round count (the round-11 leak grew linearly with rounds)
    assert(live.size <= 1, s"stale round frames leaked: $live")
    Iteration.release(cur)
  }
}
