package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row

/** Generic, dependency-free proto3 wire codec for NESTED record trees,
  * driven entirely by a [[ProtoDescriptor.Message]] — the runtime
  * counterpart of the reference's prost codegen, which compiles
  * arbitrarily nested per-chain .proto files into encodable structs
  * (etl-rust `src/example_config/build_proto.rs:216-322`,
  * `docs/protobuf.md:3-8`: block → transactions → instructions). The
  * flat [[Proto3]] encoder stays as the codegen'd hot path for the
  * fixed TxRecord; this codec covers the record TREE so a chain
  * profile's whole nested block serializes from the same checked-in
  * descriptor that derives its Spark schema and fan-out tables.
  *
  * Wire rules (proto3 encoding spec): little-endian base-128 varints;
  * zigzag for sint32/64; fixed32/64 little-endian; length-delimited
  * strings/bytes/sub-messages; repeated NUMERIC fields packed (one
  * length-delimited payload — proto3 default), repeated
  * strings/bytes/messages one tag per element; scalar fields at their
  * default value (0 / "" / false / empty) omitted; fields written in
  * ascending tag order (canonical prost layout). Non-repeated MESSAGE
  * fields are always emitted (presence semantics: the engine's rows
  * are non-null structs — an all-default sub-message encodes as
  * tag + len 0, which decodes back to the default row).
  *
  * The decoder tolerates unknown fields (skips by wire type) and
  * out-of-order fields, and returns default values for absent ones —
  * the forward-compatibility contract proto3 requires.
  */
object ProtoWire {

  import ProtoDescriptor.{Field, Message, Wire}

  // ----- low-level writers -----

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v >>> 7) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v = v >>> 7 }
    out.write((v & 0x7f).toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, tag: Int, wire: Int): Unit =
    writeVarint(out, ((tag.toLong << 3) | wire))

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
    out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
  }

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Numeric value of one scalar element as it goes on the wire
    * (pre-zigzag for sint types). */
  private def scalarBits(f: Field, v: Any): Long = {
    val raw: Long = v match {
      case l: Long => l
      // uint32/fixed32 are not sign-extended on the wire: a value with
      // the high bit set must encode as the canonical 5-byte (varint)
      // or 4-byte (fixed) form, not a 10-byte sign-extension
      case i: Int if f.ptype == "uint32" || f.ptype == "fixed32" =>
        i.toLong & 0xffffffffL
      case i: Int => i.toLong
      case b: Boolean => if (b) 1L else 0L
      case fl: Float => java.lang.Float.floatToIntBits(fl).toLong & 0xffffffffL
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case s: String => // enum value name
        f.enumDef.map(_.numberOf(s).toLong).getOrElse(
          throw new IllegalArgumentException(s"field ${f.name}: string '$s' for non-enum"))
      case other => throw new IllegalArgumentException(
        s"field ${f.name}: unsupported scalar value $other")
    }
    if (f.zigzag) Proto3.zigzag(raw) else raw
  }

  private def writeScalar(out: ByteArrayOutputStream, f: Field, v: Any): Unit =
    f.wireType match {
      case Wire.Varint => writeVarint(out, scalarBits(f, v))
      case Wire.Fixed32 => writeFixed32(out, scalarBits(f, v).toInt)
      case Wire.Fixed64 => writeFixed64(out, scalarBits(f, v))
      case w => throw new IllegalArgumentException(s"field ${f.name}: wire $w not scalar")
    }

  private def lenDelimited(out: ByteArrayOutputStream, tag: Int, payload: Array[Byte]): Unit = {
    writeTag(out, tag, Wire.Len)
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  private def isDefault(f: Field, v: Any): Boolean = v match {
    case l: Long => l == 0L
    case i: Int => i == 0
    case b: Boolean => !b
    // bit-pattern zero only: -0.0 is NOT default, so it round-trips
    case fl: Float => java.lang.Float.floatToRawIntBits(fl) == 0
    case d: Double => java.lang.Double.doubleToRawLongBits(d) == 0L
    case s: String => if (f.enumDef.isDefined) f.enumDef.get.numberOf(s) == 0 else s.isEmpty
    case b: Array[Byte] => b.isEmpty
    case null => true
    case _ => false
  }

  // ----- encoder -----

  /** Encode a Spark [[Row]] (whose schema matches `m.sparkSchema`, by
    * field NAME) against the descriptor. Canonical layout: ascending
    * tag order, defaults omitted, packed repeated numerics. */
  def encode(row: Row, m: Message): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    m.fields.sortBy(_.tag).foreach { f =>
      // schema-less GenericRows (tests, hand-built trees) are addressed
      // positionally in descriptor declaration order — the same order
      // m.sparkSchema declares
      val idx =
        if (row.schema != null) row.fieldIndex(f.name)
        else m.fields.indexWhere(_.name == f.name)
      val v = row.get(idx)
      if (f.repeated) {
        val items: Seq[Any] = v match {
          case null => Seq.empty
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_] => a.toSeq
          case other => throw new IllegalArgumentException(
            s"field ${f.name}: repeated value is not a sequence: $other")
        }
        if (items.nonEmpty) f.message match {
          case Some(cm) =>
            items.foreach { it =>
              lenDelimited(out, f.tag, encode(it.asInstanceOf[Row], cm))
            }
          case None if f.ptype == "string" =>
            items.foreach(it =>
              lenDelimited(out, f.tag, it.asInstanceOf[String].getBytes("UTF-8")))
          case None if f.ptype == "bytes" =>
            items.foreach(it => lenDelimited(out, f.tag, it.asInstanceOf[Array[Byte]]))
          case None => // packed numerics (proto3 default)
            val packed = new ByteArrayOutputStream(items.size * 2)
            items.foreach(it => writeScalar(packed, f, it))
            lenDelimited(out, f.tag, packed.toByteArray)
        }
      } else f.message match {
        case Some(cm) => // always-present nested message (non-null rows)
          lenDelimited(out, f.tag, encode(v.asInstanceOf[Row], cm))
        case None if !isDefault(f, v) =>
          f.ptype match {
            case "string" => // (an enum field's ptype is the ENUM name,
              // so it falls to the scalar branch below)
              lenDelimited(out, f.tag, v.asInstanceOf[String].getBytes("UTF-8"))
            case "bytes" => lenDelimited(out, f.tag, v.asInstanceOf[Array[Byte]])
            case _ => // numeric scalars and enums
              writeTag(out, f.tag, f.wireType)
              writeScalar(out, f, v)
          }
        case None => () // default scalar omitted
      }
    }
    out.toByteArray
  }

  // ----- decoder -----

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(pos < end && shift < 64, "malformed varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def slice(len: Int): (Int, Int) = {
      require(pos + len <= end, "truncated length-delimited field")
      val r = (pos, pos + len); pos += len; r
    }
  }

  private def defaultOf(f: Field): Any =
    if (f.repeated) Seq.empty
    else f.message match {
      case Some(cm) => defaultRow(cm)
      case None => f.enumDef match {
        case Some(e) => e.values.head._1
        case None => f.ptype match {
          case "int32" | "uint32" | "sint32" | "fixed32" | "sfixed32" => 0
          case "int64" | "uint64" | "sint64" | "fixed64" | "sfixed64" => 0L
          case "bool" => false
          case "float" => 0f
          case "double" => 0d
          case "string" => ""
          case "bytes" => Array.empty[Byte]
          case t => throw new IllegalArgumentException(s"no default for '$t'")
        }
      }
    }

  /** The all-defaults row of a message (what an empty encoding decodes to). */
  def defaultRow(m: Message): Row = Row.fromSeq(m.fields.map(defaultOf))

  private def scalarFromBits(f: Field, bits: Long): Any = {
    val raw = if (f.zigzag) Proto3.unzigzag(bits) else bits
    f.enumDef match {
      case Some(e) => e.nameOf(raw.toInt)
      case None => f.ptype match {
        case "int32" | "uint32" | "sint32" | "fixed32" | "sfixed32" => raw.toInt
        case "int64" | "uint64" | "sint64" | "fixed64" | "sfixed64" => raw
        case "bool" => raw != 0L
        case "float" => java.lang.Float.intBitsToFloat(raw.toInt)
        case "double" => java.lang.Double.longBitsToDouble(raw)
        case t => throw new IllegalArgumentException(s"scalar bits for '$t'?")
      }
    }
  }

  /** Decode wire bytes into a [[Row]] matching `m.sparkSchema` field
    * order. Unknown fields are skipped; absent fields get defaults. */
  def decode(bytes: Array[Byte], m: Message): Row =
    decodeRange(bytes, 0, bytes.length, m)

  private def decodeRange(bytes: Array[Byte], from: Int, to: Int, m: Message): Row = {
    val byTag = m.fields.map(f => f.tag -> f).toMap
    val acc = scala.collection.mutable.Map.empty[String, Any]
    val reps = scala.collection.mutable.Map.empty[String, Vector[Any]]
    val r = new Reader(bytes, from, to)
    while (r.hasMore) {
      val key = r.varint()
      val tag = (key >>> 3).toInt
      val wire = (key & 7).toInt
      byTag.get(tag) match {
        case Some(f) => wire match {
          case Wire.Varint =>
            val bits = r.varint()
            if (f.repeated) reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+
              scalarFromBits(f, bits)
            else acc(f.name) = scalarFromBits(f, bits)
          case Wire.Fixed32 =>
            val bits = r.fixed32().toLong & 0xffffffffL
            if (f.repeated) reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+
              scalarFromBits(f, bits)
            else acc(f.name) = scalarFromBits(f, bits)
          case Wire.Fixed64 =>
            val bits = r.fixed64()
            if (f.repeated) reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+
              scalarFromBits(f, bits)
            else acc(f.name) = scalarFromBits(f, bits)
          case Wire.Len =>
            val len = r.varint().toInt
            val (s, e) = r.slice(len)
            f.message match {
              case Some(cm) =>
                val sub = decodeRange(bytes, s, e, cm)
                if (f.repeated)
                  reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+ sub
                else acc(f.name) = sub
              case None if f.ptype == "string" =>
                val v = new String(bytes, s, e - s, "UTF-8")
                if (f.repeated)
                  reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+ v
                else acc(f.name) = v
              case None if f.ptype == "bytes" =>
                val v = java.util.Arrays.copyOfRange(bytes, s, e)
                if (f.repeated)
                  reps(f.name) = reps.getOrElse(f.name, Vector.empty) :+ v
                else acc(f.name) = v
              case None => // packed repeated numerics
                require(f.repeated, s"field ${f.name}: Len wire for scalar")
                val pr = new Reader(bytes, s, e)
                var items = reps.getOrElse(f.name, Vector.empty)
                while (pr.hasMore) {
                  val bits = f.wireType match {
                    case Wire.Varint => pr.varint()
                    case Wire.Fixed32 => pr.fixed32().toLong & 0xffffffffL
                    case Wire.Fixed64 => pr.fixed64()
                    case w => throw new IllegalArgumentException(s"packed wire $w")
                  }
                  items :+= scalarFromBits(f, bits)
                }
                reps(f.name) = items
            }
          case w => throw new IllegalArgumentException(s"unknown wire type $w")
        }
        case None => // unknown field: skip by wire type (forward compat)
          wire match {
            case Wire.Varint => r.varint()
            case Wire.Fixed32 => r.fixed32()
            case Wire.Fixed64 => r.fixed64()
            case Wire.Len => val len = r.varint().toInt; r.slice(len)
            case w => throw new IllegalArgumentException(s"unknown wire type $w")
          }
      }
    }
    Row.fromSeq(m.fields.map { f =>
      if (f.repeated) reps.getOrElse(f.name, Vector.empty)
      else acc.getOrElse(f.name, defaultOf(f))
    })
  }
}
