package graft

import graft.sources.{BlockSources, BlockTransport, FetchStage, KeyOrderedStore}
import graft.sources.FetchStage.FetchConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** Call ledger for the flaky test transport — static so executor threads
  * (same JVM at local[*]) and the spec share it. */
object FetchLedger {
  val calls = TrieMap.empty[String, AtomicLong] // per endpoint
  val opened = new AtomicLong(0)
  val failPlan = TrieMap.empty[Long, Int] // block -> failures to inject on primary
  def count(ep: String): Long = calls.get(ep).map(_.get).getOrElse(0L)
  def record(ep: String): Unit = calls.getOrElseUpdate(ep, new AtomicLong).incrementAndGet()
  def reset(): Unit = { calls.clear(); opened.set(0); failPlan.clear() }
}

/** Primary endpoint fails per FetchLedger.failPlan (Int.MaxValue = always);
  * fallback always succeeds. */
final class FlakyTransport extends BlockTransport {
  FetchLedger.opened.incrementAndGet()
  override def fetchBlock(endpoint: String, bn: Long): String = {
    FetchLedger.record(endpoint)
    if (endpoint == "primary") {
      val left = FetchLedger.failPlan.getOrElse(bn, 0)
      if (left > 0) {
        if (left != Int.MaxValue) FetchLedger.failPlan.update(bn, left - 1)
        throw new RuntimeException(s"injected failure for block $bn")
      }
    }
    s"""{"block_number":$bn,"via":"$endpoint"}"""
  }
}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val flakyFactory = new (() => BlockTransport) with Serializable {
    def apply(): BlockTransport = new FlakyTransport
  }

  test("S4 fetch: transient primary failures retry with backoff, no fallback") {
    FetchLedger.reset()
    FetchLedger.failPlan.update(3L, 2) // block 3 fails twice, then succeeds
    val out = FetchStage.fetchBlocks(
      spark.range(0, 8).toDF("block_number").coalesce(1),
      FetchConfig("primary", Some("fallback"), maxRetries = 3, backoffMillis = 0),
      flakyFactory).collect()
    assert(out.length === 8)
    assert(out.forall(_.getString(1).contains("\"via\":\"primary\"")))
    assert(FetchLedger.count("primary") === 8 + 2) // 2 retries
    assert(FetchLedger.count("fallback") === 0)
  }

  test("S4 fetch: exhausted primary fails over to the fallback endpoint") {
    FetchLedger.reset()
    FetchLedger.failPlan.update(5L, Int.MaxValue) // block 5: primary never works
    val out = FetchStage.fetchBlocks(
      spark.range(0, 8).toDF("block_number").coalesce(1),
      FetchConfig("primary", Some("fallback"), maxRetries = 2, backoffMillis = 0),
      flakyFactory).collect()
    val via5 = out.find(_.getLong(0) == 5L).get.getString(1)
    assert(via5.contains("\"via\":\"fallback\""))
    assert(FetchLedger.count("primary") === 7 + 3) // 1 + maxRetries attempts on block 5
    assert(FetchLedger.count("fallback") === 1)
  }

  test("S4 fetch: no fallback configured -> the task error propagates") {
    FetchLedger.reset()
    FetchLedger.failPlan.update(1L, Int.MaxValue)
    val ex = intercept[Exception] {
      FetchStage.fetchBlocks(
        spark.range(0, 3).toDF("block_number").coalesce(1),
        FetchConfig("primary", None, maxRetries = 1, backoffMillis = 0),
        flakyFactory).collect()
    }
    assert(ex.getMessage.contains("injected failure") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected failure")))
  }

  test("S4 fetch: one pooled transport per partition; attempts are metered") {
    FetchLedger.reset()
    FetchLedger.failPlan.update(2L, 1)
    val metrics = new graft.operators.EngineMetrics(spark.sparkContext)
    val df = FetchStage.fetchBlocks(
      spark.range(0, 40).toDF("block_number").repartition(4),
      FetchConfig("primary", Some("fallback"), maxRetries = 3, backoffMillis = 0),
      flakyFactory, Some(metrics))
    assert(df.count() === 40)
    assert(FetchLedger.opened.get === 4, "expected one transport per partition")
    assert(metrics.snapshot()("request_count") === 41) // 40 + 1 retry
    assert(metrics.snapshot()("failed_request_count") === 1)
  }

  test("S4 REST transport: paginated pages reassemble the exact RPC payload") {
    val rpc = new FetchStage.SyntheticRpcTransport
    // pageLimit 2 forces multi-page walks (synthetic blocks carry 0-6 txs)
    val rest = new FetchStage.RestBlockTransport(new FetchStage.SyntheticRestWire, pageLimit = 2)
    for (bn <- 0L to 200L)
      assert(rest.fetchBlock("base", bn) === rpc.fetchBlock("base", bn), s"block $bn")
  }

  test("S4 REST transport: drives the full fetch stage (retry path shared)") {
    val restFactory = new (() => BlockTransport) with Serializable {
      def apply(): BlockTransport =
        new FetchStage.RestBlockTransport(new FetchStage.SyntheticRestWire, pageLimit = 3)
    }
    val out = FetchStage.fetchBlocks(
      spark.range(0, 50).toDF("block_number").repartition(4),
      FetchConfig("rest://primary", None, maxRetries = 1, backoffMillis = 0),
      restFactory)
    // same payloads the q63 oracle verifies for the RPC transport
    val viaRest = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rpc = new FetchStage.SyntheticRpcTransport
    viaRest.foreach { case (bn, payload) =>
      assert(payload === rpc.fetchBlock("x", bn))
    }
  }

  test("S4 gRPC transport: framed proto3 stream reassembles the exact RPC payload") {
    val rpc = new FetchStage.SyntheticRpcTransport
    val grpc = new FetchStage.GrpcBlockTransport(new FetchStage.SyntheticGrpcWire)
    for (bn <- 0L to 200L)
      assert(grpc.fetchBlock("base", bn) === rpc.fetchBlock("base", bn), s"block $bn")
  }

  test("S4 gRPC transport: drives the full fetch stage (retry path shared)") {
    val grpcFactory = new (() => BlockTransport) with Serializable {
      def apply(): BlockTransport =
        new FetchStage.GrpcBlockTransport(new FetchStage.SyntheticGrpcWire)
    }
    val out = FetchStage.fetchBlocks(
      spark.range(0, 50).toDF("block_number").repartition(4),
      FetchConfig("grpc://primary", None, maxRetries = 1, backoffMillis = 0),
      grpcFactory)
    // same payloads the q63 oracle verifies for the RPC transport
    val viaGrpc = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rpc = new FetchStage.SyntheticRpcTransport
    viaGrpc.foreach { case (bn, payload) =>
      assert(payload === rpc.fetchBlock("x", bn))
    }
  }

  test("S4 gRPC framing: round-trips messages; malformed frames are fetch failures") {
    val msgs = Vector(Array[Byte](1, 2, 3), Array.emptyByteArray, Array[Byte](9))
    val body = msgs.map(FetchStage.grpcFrame).reduceLeft(_ ++ _)
    assert(FetchStage.grpcFrames(body).map(_.toSeq) === msgs.map(_.toSeq))
    assert(FetchStage.grpcFrames(Array.emptyByteArray) === Vector.empty)
    // compressed flag and truncation must throw (retry machinery engages)
    intercept[IllegalArgumentException](
      FetchStage.grpcFrames(Array[Byte](1, 0, 0, 0, 0)))
    intercept[IllegalArgumentException](
      FetchStage.grpcFrames(FetchStage.grpcFrame(Array[Byte](1, 2)).dropRight(1)))
  }

  test("S4 REST wire: empty and nested arrays split correctly") {
    assert(FetchStage.jsonArrayElements("[]") === Vector.empty)
    assert(FetchStage.jsonArrayElements("""[{"a":1}]""") === Vector("""{"a":1}"""))
    assert(FetchStage.jsonArrayElements("""[{"a":[1,2]},{"b":{"c":3}}]""") ===
      Vector("""{"a":[1,2]}""", """{"b":{"c":3}}"""))
  }

  test("S5 key-ordered store: tablet files cover disjoint key ranges") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("s5_layout").toString
    try {
      KeyOrderedStore.write(BlockSources.blockRange(spark, 0, 400), dir, nRanges = 4)
      // per-file key intervals must not overlap (Bigtable tablet layout)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(KeyOrderedStore.KeyCol)).as("lo"),
          max(col(KeyOrderedStore.KeyCol)).as("hi"))
        .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
      assert(spans.length === 4)
      spans.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "tablet ranges overlap")
        case _ =>
      }
    } finally Staging.deleteRecursively(dir)
  }

  test("S5 key-ordered store: range scan equals the S1 generator on the sub-range") {
    val dir = java.nio.file.Files.createTempDirectory("s5_scan").toString
    try {
      KeyOrderedStore.write(BlockSources.blockRange(spark, 0, 300), dir)
      val got = KeyOrderedStore.scan(spark, dir, 120, 180)
      val want = BlockSources.blockRange(spark, 120, 180)
      assert(got.count() === 60)
      assert(got.toJSON.collect().sorted.sameElements(want.toJSON.collect().sorted))
      // half-open: end key excluded, start included
      val one = KeyOrderedStore.scan(spark, dir, 42, 43)
        .select("block_number").collect().map(_.getLong(0))
      assert(one.toSeq === Seq(42L))
    } finally Staging.deleteRecursively(dir)
  }

  test("S5 key-ordered store: the key-range predicate reaches the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("s5_prune").toString
    try {
      KeyOrderedStore.write(BlockSources.blockRange(spark, 0, 200), dir)
      val p = KeyOrderedStore.scan(spark, dir, 50, 100)
        .queryExecution.executedPlan.toString
      // pushed string-range bounds = footer min/max skips non-overlapping
      // tablet files, the Bigtable row-range read shape
      assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(row_key")
        && p.contains("LessThan(row_key"), p.linesIterator.take(12).mkString("\n"))
    } finally Staging.deleteRecursively(dir)
  }

  test("S1 blockRange: one row per index, deterministic nested txs") {
    val df = BlockSources.blockRange(spark, 10, 60)
    assert(df.count() === 50)
    assert(df.columns.toSeq === Seq("block_number", "block_time", "txs"))
    // deterministic: same range twice gives identical content
    val a = df.select(col("block_number"), to_json(col("txs"))).collect().map(_.toString).sorted
    val b = BlockSources.blockRange(spark, 10, 60)
      .select(col("block_number"), to_json(col("txs"))).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // fan-out arity matches the generator's formula
    val row = df.filter(col("block_number") === 13).select(size(col("txs"))).head()
    assert(row.getInt(0) === ((13L * 2654435761L) % 97 % 7).toInt)
    // EVERY block's arity matches — in particular n_tx = 0 blocks carry
    // ZERO txs (sequence(1, 0) is descending [1, 0]; the regression
    // fabricated two transactions per empty block)
    val bad = df.select(col("block_number"), size(col("txs")).as("n")).collect()
      .filter(r => r.getInt(1) != ((r.getLong(0) * 2654435761L) % 97 % 7).toInt)
    assert(bad.isEmpty, s"blocks with wrong tx arity: ${bad.take(5).mkString(",")}")
    assert(df.selectExpr("size(filter(txs, t -> t.fee < 0))").collect()
      .forall(_.getInt(0) == 0), "negative fees leaked from the i-1 underflow")
  }

  test("S1 blockRange: reverse iterates high-to-low") {
    val first = BlockSources.blockRange(spark, 0, 10, reverse = true)
      .select("block_number").head().getLong(0)
    assert(first === 9)
  }

  test("S2 blockListCsv: header sniffed and dropped when non-numeric") {
    val dir = Files.createTempDirectory("blocklist")
    val f = dir.resolve("list.csv")
    Files.writeString(f, "start,end\n5,6\n7,8\n")
    val got = BlockSources.blockListCsv(spark, f.toString)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(5L, 6L, 7L, 8L))
  }

  test("S2 blockListCsv: all-numeric first line is data, all fields flattened") {
    val dir = Files.createTempDirectory("blocklist2")
    val f = dir.resolve("list.csv")
    Files.writeString(f, "1,2\n3,4\n")
    val got = BlockSources.blockListCsv(spark, f.toString)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
