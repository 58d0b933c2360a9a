package graft

import graft.functions.{Proto3, ProtoDescriptor, ProtoWire}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The generic descriptor-driven NESTED proto3 codec (ProtoWire):
  * golden wire vectors computed by hand from the encoding spec,
  * agreement with the codegen'd flat encoder on its own record, packed
  * repeated numerics, enum varints, default omission/presence, unknown
  * -field skipping, and a full encode→decode round-trip of the
  * engine's synthetic nested block tree. */
class ProtoWireSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private val blockMsg = graft.operators.FanOut.descriptor

  test("generic encoder matches the codegen'd flat TxRecord encoder byte-for-byte") {
    val d = Proto3.descriptor
    val cases = Seq(
      (0L, 0L, 0L, ""), (1L, 0L, 0L, ""), (300L, 5L, -1L, "testing"),
      (Long.MaxValue, 16384L, Long.MinValue + 1, "üñíçødé ✓"),
      (7L, 3L, 1000002L, "deadbeef" * 4))
    cases.foreach { case (bn, txi, fee, h) =>
      val generic = ProtoWire.encode(Row(bn, txi, fee, h), d)
      val flat = Proto3.encodeTx(bn, txi, fee, h.getBytes("UTF-8"))
      assert(hex(generic) == hex(flat), s"bn=$bn txi=$txi fee=$fee h=$h")
    }
  }

  test("nested golden vector (hand-computed from the encoding spec)") {
    val row = Row(1L, 0L, Seq(Row("a", 1L, Seq("x", "y"))))
    // block_number=1 -> 08 01; block_time=0 omitted; txs (field 3, Len):
    // payload = tx_id "a" (0a 01 61) + fee sint64 1 -> zigzag 2 (10 02)
    //   + accounts "x","y" (1a 01 78, 1a 01 79) = 11 bytes
    assert(hex(ProtoWire.encode(row, blockMsg)) ==
      "08011a0b0a016110021a01781a0179")
    // decode returns the same tree
    val back = ProtoWire.decode(ProtoWire.encode(row, blockMsg), blockMsg)
    assert(back.getLong(0) == 1L && back.getLong(1) == 0L)
    val tx = back.getSeq[Row](2).head
    assert(tx.getString(0) == "a" && tx.getLong(1) == 1L)
    assert(tx.getSeq[String](2) == Seq("x", "y"))
  }

  test("packed repeated numerics use one length-delimited payload") {
    val ms = ProtoDescriptor.parse(
      """syntax = "proto3";
        |message P {
        |  repeated uint32 ids = 1;
        |}""".stripMargin)
    // [3, 270]: tag 0a, len 03, varints 03 / 8e 02 (the spec's example)
    val enc = ProtoWire.encode(Row(Seq(3, 270)), ms("P"))
    assert(hex(enc) == "0a03038e02")
    assert(ProtoWire.decode(enc, ms("P")).getSeq[Int](0) == Seq(3, 270))
  }

  test("enums encode as value-number varints and round-trip to names") {
    val ms = ProtoDescriptor.parse(
      """syntax = "proto3";
        |message E {
        |  Status status = 1;
        |  enum Status {
        |    UNKNOWN = 0;
        |    FINAL = 1;
        |    FAILED = 2;
        |  }
        |}""".stripMargin)
    val m = ms("E")
    assert(hex(ProtoWire.encode(Row("FAILED"), m)) == "0802")
    assert(hex(ProtoWire.encode(Row("UNKNOWN"), m)) == "") // default omitted
    assert(ProtoWire.decode(Array[Byte](0x08, 0x01), m).getString(0) == "FINAL")
    assert(ProtoWire.decode(Array.empty[Byte], m).getString(0) == "UNKNOWN")
  }

  test("decoder skips unknown fields and defaults absent ones") {
    // unknown field 9 varint + unknown field 10 len-delimited, then fee
    val bytes = Array[Byte](0x48, 0x2a, 0x52, 0x02, 0x61, 0x62, 0x18, 0x02)
    val r = ProtoWire.decode(bytes, Proto3.descriptor)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L) // absent -> defaults
    assert(r.getLong(2) == 1L) // zigzag 2 -> 1
    assert(r.getString(3) == "")
    assert(ProtoWire.decode(Array.empty[Byte], Proto3.descriptor) ==
      ProtoWire.defaultRow(Proto3.descriptor))
  }

  test("synthetic nested block tree round-trips through the wire") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val rows = graft.sources.BlockSources.blockRange(spark, 0, 60)
      .select(col("block_number"), unix_millis(col("block_time")).as("block_time"),
        col("txs"))
      .collect()
    assert(rows.exists(_.getSeq[Row](2).nonEmpty))
    assert(rows.exists(_.getSeq[Row](2).isEmpty)) // empty blocks too
    rows.foreach { r =>
      val enc = ProtoWire.encode(r, blockMsg)
      val back = ProtoWire.decode(enc, blockMsg)
      assert(back.getLong(0) == r.getLong(0))
      assert(back.getLong(1) == r.getLong(1))
      val orig = r.getSeq[Row](2)
      val dec = back.getSeq[Row](2)
      assert(dec.size == orig.size, s"block ${r.getLong(0)}")
      orig.zip(dec).foreach { case (o, d) =>
        assert(d.getString(0) == o.getString(0))
        assert(d.getLong(1) == o.getLong(1))
        assert(d.getSeq[String](2) == o.getSeq[String](2))
      }
    }
  }

  test("uint32 with the high bit set encodes canonically (no sign extension)") {
    val ms = ProtoDescriptor.parse(
      """syntax = "proto3";
        |message U {
        |  uint32 v = 1;
        |  fixed32 f = 2;
        |}""".stripMargin)
    // Int -1 carries uint32 4294967295: varint ff ff ff ff 0f (5 bytes,
    // the canonical prost layout), NOT the 10-byte sign extension;
    // fixed32 is its 4 LE bytes
    val enc = ProtoWire.encode(Row(-1, -1), ms("U"))
    assert(hex(enc) == "08ffffffff0f" + "15ffffffff")
    val back = ProtoWire.decode(enc, ms("U"))
    assert(back.getInt(0) == -1 && back.getInt(1) == -1) // wraps back
    // packed repeated path masks too
    val ms2 = ProtoDescriptor.parse(
      """syntax = "proto3";
        |message P {
        |  repeated uint32 ids = 1;
        |}""".stripMargin)
    assert(hex(ProtoWire.encode(Row(Seq(-1)), ms2("P"))) == "0a05ffffffff0f")
  }

  test("aliased enum value numbers are rejected loudly (allow_alias unsupported)") {
    val ex = intercept[IllegalArgumentException] {
      ProtoDescriptor.parse(
        """syntax = "proto3";
          |message E {
          |  Status status = 1;
          |  enum Status {
          |    UNKNOWN = 0;
          |    STARTED = 1;
          |    RUNNING = 1;
          |  }
          |}""".stripMargin)
    }
    assert(ex.getMessage.contains("aliased"))
  }
}
