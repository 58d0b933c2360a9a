package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free borsh codec for the engine's fixed transaction
  * record — the second wire format the reference's dependency set
  * implies (etl-rust `Cargo.toml:32` pulls `borsh`; Solana-family
  * account/instruction data is borsh-encoded, so a chain config that
  * decodes program data needs exactly this).
  *
  * Borsh layout rules implemented (borsh.io spec): all integers
  * little-endian fixed-width (u64/i64 = 8 bytes), strings as u32 LE
  * byte length + UTF-8 bytes, no field tags, no varints — the format
  * is positional and non-self-describing, which is why [[decodeTx]]
  * rejects trailing bytes (a borsh deserializer must consume the whole
  * buffer).
  *
  * {{{
  * struct TxRecord { block_number: u64, tx_index: u64, fee: i64, tx_hash: String }
  * }}}
  *
  * Encoded length is analytic: 3·8 + 4 + len(tx_hash) = 28 + len —
  * which is what makes the round-trip DuckDB-oracle-able (q90), the
  * same trick q62 uses for proto3. */
object Borsh {

  /** Bytes a TxRecord encodes to (hash passed as UTF-8 byte count). */
  def encodedLen(hashLen: Int): Int = 28 + hashLen

  def encodedLenSql(hashCol: String): String = s"(28 + length($hashCol))"

  /** borsh-encode one TxRecord: exact-size single allocation. */
  def encodeTx(bn: Long, txi: Long, fee: Long, hash: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](encodedLen(hash.length))
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(bn).putLong(txi).putLong(fee).putInt(hash.length).put(hash)
    out
  }

  /** Decode a TxRecord buffer to a catalyst struct row
    * (block_number, tx_index, fee, tx_hash). Strict: short buffers,
    * negative/oversized lengths, and trailing bytes all throw — borsh
    * consumers must drain the buffer exactly. */
  def decodeTxRow(b: Array[Byte]): InternalRow = {
    if (b.length < 28)
      throw new IllegalArgumentException(s"borsh TxRecord needs >= 28 bytes, got ${b.length}")
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val bn = buf.getLong(0)
    val txi = buf.getLong(8)
    val fee = buf.getLong(16)
    val strLen = buf.getInt(24)
    if (strLen < 0 || 28L + strLen != b.length)
      throw new IllegalArgumentException(
        s"borsh TxRecord length mismatch: declared $strLen, buffer ${b.length}")
    new GenericInternalRow(Array[Any](bn, txi, fee, UTF8String.fromBytes(b, 28, strLen)))
  }

  /** JVM-side decode for specs (no catalyst types). */
  def decodeTx(b: Array[Byte]): (Long, Long, Long, String) = {
    val r = decodeTxRow(b)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getUTF8String(3).toString)
  }
}
