package graft

import graft.operators.HighWatermark
import graft.sinks.{QueueConnection, QueuePublisher}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files
import scala.collection.mutable

/** Property-based checks promised in SURVEY.md §5: codec round-trips
  * (T4-T7 analogues), fan-out/publish invariants, watermark algebra. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic property loop (no scalatestplus bridge offline):
    * draws `n` samples from the generator with a fixed seed chain. */
  private def forAll[T](g: Gen[T], n: Int = 25)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 25)(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 25)(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }

  test("base64/hex round-trip any binary payload (T7 codec contract)") {
    forAll(Gen.listOfN(32, Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      import spark.implicits._
      val df = Seq(bytes.toArray).toDF("b")
        .select(
          unbase64(base64(col("b"))).as("b64rt"),
          unhex(hex(col("b"))).as("hexrt"))
      val r = df.head()
      assert(r.getAs[Array[Byte]]("b64rt").toSeq === bytes)
      assert(r.getAs[Array[Byte]]("hexrt").toSeq === bytes)
    }
  }

  test("timestamp modes are mutually consistent (T4): iso reparses to epoch") {
    forAll(Gen.choose(0L, 4102444800000L)) { ms => // up to year 2100
      import spark.implicits._
      val r = Seq(ms).toDF("ms")
        .select(
          unix_millis(to_timestamp(
            date_format(timestamp_millis(col("ms")), "yyyy-MM-dd HH:mm:ss.SSS")))
            .as("rt"))
        .head()
      assert(r.getLong(0) === ms)
    }
  }

  test("queue publisher delivers every message exactly once, in order, for any chunk size") {
    forAll2(Gen.choose(1, 50), Gen.choose(0, 200)) { (chunk, n) =>
      val published = mutable.ArrayBuffer.empty[String]
      val conn = new QueueConnection {
        override def publishBulk(msgs: Seq[Array[Byte]]): Unit =
          published ++= msgs.map(new String(_))
        override def publish(msg: Array[Byte]): Unit = published += new String(msg)
        override def close(): Unit = ()
      }
      val pub = new QueuePublisher(_ => conn, chunkSize = chunk, sleep = _ => ())
      val sent = pub.publishPartition(0, Iterator.tabulate(n)(i => s"m$i".getBytes))
      assert(sent === n)
      assert(published.toSeq === (0 until n).map(i => s"m$i"))
    }
  }

  test("watermark resume never returns a consumed sub-range") {
    forAll3(Gen.choose(0L, 500L), Gen.choose(501L, 1000L), Gen.choose(0L, 400L)) {
      (start, end, doneLen) =>
        val dir = Files.createTempDirectory("wmprop")
        val doneEnd = math.min(start + doneLen, end - 1)
        if (doneEnd > start) HighWatermark.markDone(dir, start, doneEnd)
        val (s2, _) = HighWatermark.resume(dir, start, end)
        assert(s2 >= (if (doneEnd > start) doneEnd else start))
        assert(s2 < end)
    }
  }

  test("fan-out conserves rows for arbitrary block ranges") {
    forAll2(Gen.choose(0L, 500L), Gen.choose(1L, 60L), n = 8) { (start, len) =>
      val nested = graft.sources.BlockSources.blockRange(spark, start, start + len)
      val ts = graft.operators.FanOut.tables(nested)
      val expected = nested.select(sum(size(col("txs")))).head()
      val expectedTx = if (expected.isNullAt(0)) 0L else expected.getLong(0)
      assert(ts.blocks.count() === len)
      assert(ts.transactions.count() === expectedTx)
    }
  }

  test("dsum is partition-invariant and equals the local rint-grid sum bit-for-bit") {
    // The whole point of the micro-grid: grid-then-add in exact
    // integers is associative/commutative, so the result must be
    // IDENTICAL (IEEE bytes, not approx) for ANY partitioning — the
    // invariant that makes partial/final aggregation safe to hash-gate
    // against a single-node oracle. Includes adversarial values: exact
    // .5e-6 ties, negatives, tiny/large magnitudes.
    import spark.implicits._
    val adversarial = List(0.0000005, -0.0000005, 2.5e-6, -2.5e-6,
      1.0000005, 123.4567895, -123.4567895, 0.1 + 0.2, -0.0, 1e9 - 0.25)
    forAll(Gen.listOfN(40, Gen.choose(-1e6, 1e6)), n = 6) { xs0 =>
      val xs = xs0 ++ adversarial
      val expect = java.lang.Double.doubleToLongBits(
        xs.map(v => Math.rint(v * 1e6).toLong).sum.toDouble / 1e6)
      for (parts <- Seq(1, 7, 32)) {
        val got = xs.toDF("x").repartition(parts)
          .agg(Oracle.dsum(col("x")).as("s")).head().getDouble(0)
        assert(java.lang.Double.doubleToLongBits(got) == expect,
          s"parts=$parts: $got")
      }
    }
  }
}
