package graft

import graft.functions.Borsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Borsh codec: golden little-endian wire vectors, strict-consume
  * decoding, and the native expression pair through real codegen'd
  * plans (same coverage shape as Proto3Spec for the proto path). */
class BorshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("golden wire vectors (borsh spec: LE fixed-width, u32-length string)") {
    // TxRecord { bn=1, txi=2, fee=-3, hash="ab" }
    val enc = Borsh.encodeTx(1L, 2L, -3L, "ab".getBytes("UTF-8"))
    val expect = Array[Int](
      1, 0, 0, 0, 0, 0, 0, 0, // u64 1 LE
      2, 0, 0, 0, 0, 0, 0, 0, // u64 2 LE
      0xfd, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, // i64 -3 two's complement LE
      2, 0, 0, 0, // u32 string length
      'a'.toInt, 'b'.toInt).map(_.toByte)
    assert(enc.toSeq === expect.toSeq)
    assert(enc.length === Borsh.encodedLen(2))
  }

  test("encode→decode round-trip across the value range") {
    for (bn <- Seq(0L, 1L, Long.MaxValue);
         fee <- Seq(Long.MinValue, -1L, 0L, 7L, Long.MaxValue);
         hash <- Seq("", "x", "0123456789abcdef0123456789abcdef")) {
      val dec = Borsh.decodeTx(Borsh.encodeTx(bn, 5L, fee, hash.getBytes("UTF-8")))
      assert(dec === ((bn, 5L, fee, hash)))
    }
  }

  test("decoder is strict: short buffers, bad lengths, trailing bytes throw") {
    intercept[IllegalArgumentException](Borsh.decodeTx(new Array[Byte](27)))
    val ok = Borsh.encodeTx(1L, 2L, 3L, "abc".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Borsh.decodeTx(ok ++ Array[Byte](0))) // trailing
    val badLen = ok.clone(); badLen(24) = 99 // declared 99, only 3 present
    intercept[IllegalArgumentException](Borsh.decodeTx(badLen))
  }

  test("borsh expressions: codegen path round-trips real rows") {
    import org.apache.spark.sql.graft.BorshExpressions._
    import spark.implicits._
    val df = spark.range(0, 500).toDF("bn")
      .withColumn("txi", col("bn") % 7)
      .withColumn("fee", col("bn") * 31 - 5000)
      .withColumn("hash", md5(col("bn").cast("string")))
      .withColumn("dec",
        borshDecodeTx(borshEncodeTx(col("bn"), col("txi"), col("fee"), col("hash"))))
    val bad = df.filter(
      col("dec.block_number") =!= col("bn") || col("dec.tx_index") =!= col("txi") ||
        col("dec.fee") =!= col("fee") || col("dec.tx_hash") =!= col("hash"))
    assert(bad.count() === 0L)
    // decoded struct supports ordinary field pruning/aggregation
    val s = df.agg(sum(col("dec.fee"))).as[Long].head()
    assert(s === (0 until 500).map(i => i * 31L - 5000L).sum)
  }
}
