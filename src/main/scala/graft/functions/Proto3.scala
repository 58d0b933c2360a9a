package graft.functions

/** Dependency-free proto3 wire-format encoder for the engine's fixed
  * transaction record — the reference's actual sink payload format: every
  * queue sink publishes prost `Message::encode_to_vec()` bytes
  * (etl-rust `src/output/google_pubsub.rs:188-190`, `apache_kafka.rs:107-109`,
  * `docs/protobuf.md:3-8`). The reference generates its message types from
  * per-chain .proto files at build time; this engine carries the
  * equivalent fixed schema:
  *
  * {{{
  * // proto3
  * message TxRecord {
  *   uint64 block_number = 1;  // varint
  *   uint64 tx_index     = 2;  // varint
  *   sint64 fee          = 3;  // zigzag varint
  *   string tx_hash      = 4;  // length-delimited
  * }
  * }}}
  *
  * Wire rules implemented (proto3 spec): little-endian base-128 varints,
  * zigzag for sint64, tag = (field << 3) | wireType, length-delimited
  * strings, and default-value omission (0 / "" fields are absent).
  * Encoding is canonical prost behavior: fields in ascending field-number
  * order, no unknown fields.
  */
object Proto3 {

  /** The TxRecord descriptor, parsed from the checked-in .proto — the
    * wire tags below and the record's Spark schema derive from it
    * (see [[ProtoDescriptor]]; mirrors the reference's build-time
    * codegen, `src/example_config/build_proto.rs:216-322`). */
  val descriptor: ProtoDescriptor.Message =
    ProtoDescriptor.load("/graft/tx_record.proto")("TxRecord")

  /** Spark schema of a TxRecord, derived from the descriptor. */
  def sparkSchema: org.apache.spark.sql.types.StructType = descriptor.sparkSchema

  // descriptor-derived tag bytes (fail at class-load if the .proto
  // drifts from what the encoder can write)
  private val TagBn: Byte = descriptor.field("block_number").tagByte
  private val TagTxi: Byte = descriptor.field("tx_index").tagByte
  private val TagFee: Byte = descriptor.field("fee").tagByte
  private val TagHash: Byte = descriptor.field("tx_hash").tagByte
  require(descriptor.field("fee").zigzag,
    "fee must be sint64 — the encoder zigzags it")

  /** Bytes a varint needs for unsigned v (1..10). */
  def varintLen(v: Long): Int = {
    var x = v
    var n = 1
    // unsigned shift: 10 bytes max for negative-as-unsigned
    while ((x >>> 7) != 0) { x = x >>> 7; n += 1 }
    n
  }

  /** Zigzag-encode a signed long (sint64). */
  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Decoded zigzag (for the round-trip spec). */
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarint(buf: Array[Byte], at: Int, v: Long): Int = {
    var x = v
    var i = at
    while ((x >>> 7) != 0) {
      buf(i) = ((x & 0x7f) | 0x80).toByte
      x = x >>> 7
      i += 1
    }
    buf(i) = x.toByte
    i + 1
  }

  /** Encoded size of a TxRecord (hash passed as UTF-8 byte count). */
  def encodedLen(bn: Long, txi: Long, fee: Long, hashLen: Int): Int = {
    var n = 0
    if (bn != 0L) n += 1 + varintLen(bn)
    if (txi != 0L) n += 1 + varintLen(txi)
    if (fee != 0L) n += 1 + varintLen(zigzag(fee))
    if (hashLen != 0) n += 1 + varintLen(hashLen.toLong) + hashLen
    n
  }

  /** proto3-encode one TxRecord. Called from the codegen'd projection —
    * one allocation, exact size, no copies. */
  def encodeTx(bn: Long, txi: Long, fee: Long, hash: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](encodedLen(bn, txi, fee, hash.length))
    var i = 0
    if (bn != 0L) { out(i) = TagBn; i = writeVarint(out, i + 1, bn) }
    if (txi != 0L) { out(i) = TagTxi; i = writeVarint(out, i + 1, txi) }
    if (fee != 0L) { out(i) = TagFee; i = writeVarint(out, i + 1, zigzag(fee)) }
    if (hash.length != 0) {
      out(i) = TagHash
      i = writeVarint(out, i + 1, hash.length.toLong)
      System.arraycopy(hash, 0, out, i, hash.length)
    }
    out
  }

  /** Minimal decoder for the round-trip spec: returns
    * (block_number, tx_index, fee, tx_hash) with proto3 defaults for
    * absent fields. Unknown varint/length-delimited fields are skipped
    * (forward compatibility, like prost). */
  def decodeTx(bytes: Array[Byte]): (Long, Long, Long, String) = {
    var i = 0
    var bn = 0L; var txi = 0L; var fee = 0L; var hash = ""
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        val b = bytes(i); i += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    val (fBn, fTxi, fFee, fHash) = (descriptor.field("block_number").tag,
      descriptor.field("tx_index").tag, descriptor.field("fee").tag,
      descriptor.field("tx_hash").tag)
    while (i < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (`fBn`, 0) => bn = readVarint()
        case (`fTxi`, 0) => txi = readVarint()
        case (`fFee`, 0) => fee = unzigzag(readVarint())
        case (`fHash`, 2) =>
          val len = readVarint().toInt
          hash = new String(bytes, i, len, java.nio.charset.StandardCharsets.UTF_8)
          i += len
        case (_, 0) => readVarint() // skip unknown varint
        case (_, 1) => i += 8 // skip unknown fixed64 (prost skips these too)
        case (_, 2) => // skip unknown bytes; NB read the length BEFORE
          val skip = readVarint().toInt // touching i (+= reads i first)
          i += skip
        case (_, 5) => i += 4 // skip unknown fixed32
        case (f, w) => throw new IllegalArgumentException(s"wire type $w field $f")
      }
    }
    (bn, txi, fee, hash)
  }

  /** DuckDB SQL mirror of [[varintLen]] for values < 2⁶³ (nested CASE —
    * the oracle verifies encoded LENGTHS analytically; encoded BYTES are
    * verified by the Scala round-trip + golden-vector spec). */
  def varintLenSql(x: String): String =
    s"""(CASE WHEN $x < 128 THEN 1 WHEN $x < 16384 THEN 2
       | WHEN $x < 2097152 THEN 3 WHEN $x < 268435456 THEN 4
       | WHEN $x < 34359738368 THEN 5 WHEN $x < 4398046511104 THEN 6
       | WHEN $x < 562949953421312 THEN 7 WHEN $x < 72057594037927936 THEN 8
       | ELSE 9 END)""".stripMargin

  /** DuckDB SQL mirror of [[encodedLen]] for non-negative fee and a
    * non-empty hash string column. */
  def encodedLenSql(bn: String, txi: String, fee: String, hash: String): String =
    s"""((CASE WHEN $bn = 0 THEN 0 ELSE 1 + ${varintLenSql(bn)} END)
       | + (CASE WHEN $txi = 0 THEN 0 ELSE 1 + ${varintLenSql(txi)} END)
       | + (CASE WHEN $fee = 0 THEN 0 ELSE 1 + ${varintLenSql(s"(2 * $fee)")} END)
       | + 1 + ${varintLenSql(s"length($hash)")} + length($hash))""".stripMargin
}
