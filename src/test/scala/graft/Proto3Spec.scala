package graft

import graft.functions.Proto3
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level verification of the proto3 encoder (T5): golden wire
  * vectors from the protobuf encoding spec, encode→decode round-trips,
  * default-omission, and the codegen'd expression path end-to-end. */
class Proto3Spec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("schema and tags derive from the checked-in .proto descriptor") {
    import org.apache.spark.sql.types._
    val d = Proto3.descriptor
    assert(d.name == "TxRecord")
    assert(d.fields.map(f => (f.name, f.ptype, f.tag)) == Seq(
      ("block_number", "uint64", 1), ("tx_index", "uint64", 2),
      ("fee", "sint64", 3), ("tx_hash", "string", 4)))
    // derived tag bytes equal the proto3 golden values the wire vectors pin
    assert(d.field("block_number").tagByte == 0x08.toByte)
    assert(d.field("tx_index").tagByte == 0x10.toByte)
    assert(d.field("fee").tagByte == 0x18.toByte)
    assert(d.field("tx_hash").tagByte == 0x22.toByte)
    assert(d.field("fee").zigzag && !d.field("tx_index").zigzag)
    // StructType derived from the descriptor, not hand-maintained
    assert(Proto3.sparkSchema == StructType(Seq(
      StructField("block_number", LongType, nullable = false),
      StructField("tx_index", LongType, nullable = false),
      StructField("fee", LongType, nullable = false),
      StructField("tx_hash", StringType, nullable = false))))
  }

  test("descriptor parser handles the supported proto3 subset and rejects the rest") {
    import graft.functions.ProtoDescriptor
    val m = ProtoDescriptor.parse(
      """syntax = "proto3"; // header comment
        |package x; /* block
        |   comment */
        |message Evt {
        |  repeated uint32 ids = 1;
        |  bytes payload = 2;
        |  double score = 3;
        |  fixed32 crc = 4;
        |}""".stripMargin)("Evt")
    assert(m.field("ids").repeated && m.field("ids").wireType == 0)
    assert(m.field("payload").wireType == 2)
    assert(m.field("score").wireType == 1)
    assert(m.field("crc").wireType == 5)
    import org.apache.spark.sql.types._
    assert(m.sparkSchema("ids").dataType == ArrayType(IntegerType, containsNull = false))
    assert(m.sparkSchema("payload").dataType == BinaryType)
    intercept[IllegalArgumentException] {
      ProtoDescriptor.parse("syntax = \"proto2\";")
    }
    // multi-line bodies so the parser reaches Message construction and
    // the INTENDED rejection fires (ADVICE r7: single-line bodies fell
    // through to the generic unsupported-construct error)
    val mapErr = intercept[IllegalArgumentException] {
      ProtoDescriptor.parse(
        "syntax = \"proto3\";\nmessage A {\n  map<string, int32> m = 1;\n}")
    }
    assert(mapErr.getMessage.contains("map"), mapErr.getMessage)
    val dupErr = intercept[IllegalArgumentException] { // duplicate tags
      ProtoDescriptor.parse(
        "syntax = \"proto3\";\nmessage A {\n  uint64 a = 1;\n  uint64 b = 1;\n}")
    }
    assert(dupErr.getMessage.toLowerCase.contains("duplicate"), dupErr.getMessage)
  }

  test("golden wire vectors (protobuf spec examples)") {
    // field 1 (uint64) = 1 → tag 0x08, varint 01
    assert(hex(Proto3.encodeTx(1L, 0L, 0L, Array.empty)) === "0801")
    // varint 300 = 0xAC 0x02 (the canonical two-byte example)
    assert(hex(Proto3.encodeTx(300L, 0L, 0L, Array.empty)) === "08ac02")
    // field 2 tag = 0x10
    assert(hex(Proto3.encodeTx(0L, 5L, 0L, Array.empty)) === "1005")
    // sint64 zigzag: 1 → 2, -1 → 1, -2 → 3 (field 3 tag = 0x18)
    assert(hex(Proto3.encodeTx(0L, 0L, 1L, Array.empty)) === "1802")
    assert(hex(Proto3.encodeTx(0L, 0L, -1L, Array.empty)) === "1801")
    assert(hex(Proto3.encodeTx(0L, 0L, -2L, Array.empty)) === "1803")
    // string field 4: tag 0x22, length, utf8 bytes ("testing")
    assert(hex(Proto3.encodeTx(0L, 0L, 0L, "testing".getBytes("UTF-8")))
      === "220774657374696e67")
    // proto3 default omission: all-defaults record is zero bytes
    assert(Proto3.encodeTx(0L, 0L, 0L, Array.empty).isEmpty)
  }

  test("encode→decode round-trip across the value range") {
    val bns = Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, Long.MaxValue)
    val fees = Seq(0L, 1L, -1L, 2L, -2L, 1000002L, Long.MaxValue, Long.MinValue + 1)
    val hashes = Seq("", "a", "deadbeef" * 4, "üñíçødé ✓")
    for (bn <- bns; fee <- fees; h <- hashes) {
      val enc = Proto3.encodeTx(bn, 3L, fee, h.getBytes("UTF-8"))
      assert(Proto3.decodeTx(enc) === ((bn, 3L, fee, h)), s"bn=$bn fee=$fee h=$h")
      assert(enc.length === Proto3.encodedLen(bn, 3L, fee, h.getBytes("UTF-8").length))
    }
  }

  test("zigzag matches the spec table") {
    assert(Proto3.zigzag(0L) === 0L)
    assert(Proto3.zigzag(-1L) === 1L)
    assert(Proto3.zigzag(1L) === 2L)
    assert(Proto3.zigzag(-2L) === 3L)
    assert(Proto3.zigzag(Long.MaxValue) === -2L) // 0xFFFF...FE as unsigned
    (-1000L to 1000L).foreach(v => assert(Proto3.unzigzag(Proto3.zigzag(v)) === v))
  }

  test("decoder skips unknown fields (forward compatibility)") {
    // field 5 varint (tag 0x28) + field 6 bytes (tag 0x32) interleaved
    val known = Proto3.encodeTx(7L, 0L, 0L, Array.empty)
    val unknown = Array[Byte](0x28, 0x2a, 0x32, 0x02, 0x61, 0x62)
    assert(Proto3.decodeTx(known ++ unknown) === ((7L, 0L, 0L, "")))
  }

  test("proto_encode_tx expression: codegen path round-trips real rows") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ProtoExpressions.protoEncodeTx
    val rows = spark.range(0L, 1000L).toDF("bn")
      .withColumn("txi", col("bn") % 5)
      .withColumn("fee", (col("bn") * 7919L) % 1000003L - 500000L)
      .withColumn("h", md5(concat_ws("-", col("bn"), col("txi"))))
      .withColumn("enc", protoEncodeTx(col("bn"), col("txi"), col("fee"), col("h")))
      .select("bn", "txi", "fee", "h", "enc")
      .collect()
    rows.foreach { r =>
      val dec = Proto3.decodeTx(r.getAs[Array[Byte]]("enc"))
      assert(dec === ((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))))
    }
  }
}
