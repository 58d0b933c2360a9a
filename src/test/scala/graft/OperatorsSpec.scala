package graft

import graft.config._
import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- C1 high-watermark resume -------------------------------------

  test("C1 resume: empty dir leaves the range untouched") {
    val dir = Files.createTempDirectory("wm")
    assert(HighWatermark.resume(dir, 100, 200) === ((100L, None)))
  }

  test("C1 resume: start advances past max completed endpoint") {
    val dir = Files.createTempDirectory("wm")
    HighWatermark.markDone(dir, 100, 150)
    HighWatermark.markDone(dir, 150, 180)
    assert(HighWatermark.resume(dir, 100, 200) === ((180L, None)))
  }

  test("C1 resume: reverse mode pulls end below min completed start") {
    val dir = Files.createTempDirectory("wm")
    HighWatermark.markDone(dir, 150, 200)
    assert(HighWatermark.resume(dir, 100, 200, reverse = true) === ((100L, Some(150L))))
  }

  test("C1 resume: fully-indexed range fails fast (reference panics)") {
    val dir = Files.createTempDirectory("wm")
    HighWatermark.markDone(dir, 0, 200)
    intercept[IllegalArgumentException] {
      HighWatermark.resume(dir, 100, 200)
    }
  }

  test("C1 resume: foreign files in the marker dir are ignored") {
    val dir = Files.createTempDirectory("wm")
    Files.writeString(dir.resolve("README"), "not a range")
    HighWatermark.markDone(dir, 100, 120)
    assert(HighWatermark.resume(dir, 100, 200) === ((120L, None)))
  }

  // ---- C4 metrics ----------------------------------------------------

  test("C4 accumulators count requests and failures from executors") {
    val m = new EngineMetrics(spark.sparkContext)
    val rdd = spark.sparkContext.parallelize(1 to 100, 4)
    rdd.foreach { i =>
      try m.countRequest { if (i % 10 == 0) throw new RuntimeException("rpc down") }
      catch { case _: RuntimeException => }
    }
    val snap = m.snapshot()
    assert(snap("request_count") === 100)
    assert(snap("failed_request_count") === 10)
  }

  // ---- C6/C7 config validation --------------------------------------

  test("C6 config: sink/timestamp-mode pairing enforced (features.rs matrix)") {
    intercept[IllegalArgumentException] {
      GraftConfig(SinkKind.Queue, TimestampMode.IsoString, "/tmp/x", Seq("blocks"))
    }
    // the valid pairing constructs fine
    GraftConfig(SinkKind.Queue, TimestampMode.EpochInt, "/tmp/x", Seq("blocks"))
  }

  test("C6 config: duplicate tables and unknown enum names fail fast") {
    intercept[IllegalArgumentException] {
      GraftConfig(SinkKind.JsonFiles, TimestampMode.IsoString, "/tmp/x", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("GRAFT_SINK" -> "bigquery", "GRAFT_OUTPUT_DIR" -> "/tmp/x"))
    }
  }

  test("C7 config: env loading picks defaults per sink") {
    val c = GraftConfig.fromEnv(Map("GRAFT_SINK" -> "queue", "GRAFT_OUTPUT_DIR" -> "/tmp/q"))
    assert(c.timestampMode === TimestampMode.EpochInt)
    assert(c.tables === Seq("blocks", "transactions"))
  }

  // ---- Multimodal plumbing ------------------------------------------

  test("multimodal: batched feature extraction is deterministic and schema-bound") {
    val assets = Multimodal.syntheticAssets(spark, 100).repartition(4)
    val feats = Multimodal.extractFeatures(assets, batchSize = 16)
    assert(feats.schema === Multimodal.featureSchema)
    assert(feats.count() === 100)
    val a = feats.orderBy("asset_id").collect().map(_.toString)
    val b = Multimodal.extractFeatures(assets, batchSize = 7) // different batch split
      .orderBy("asset_id").collect().map(_.toString)
    assert(a.sameElements(b)) // batch boundaries must not change values
  }
}
