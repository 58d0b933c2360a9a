package graft.functions

import org.apache.spark.sql.types._

/** Proto3 descriptor loader: parses a checked-in `.proto` file into
  * message/enum metadata (field name, type, tag, wire type, nesting)
  * and derives Spark `StructType`s from it — the schema-derivation
  * lifecycle the reference runs at build time (etl-rust
  * `src/example_config/build_proto.rs:216-322` feeds per-chain .proto
  * files through prost codegen, which compiles arbitrary message
  * nesting). Here the derivation happens at class-load from
  * `src/main/resources`, so the descriptor file is the single source of
  * truth: [[Proto3]]'s wire tags, the record's StructType, AND the
  * fan-out table tree ([[graft.operators.FanOut.fromDescriptor]]) all
  * come from it, and a user adding a chain profile edits ONE file.
  *
  * Scope: the proto3 subset the reference's record trees use
  * (`docs/protobuf.md:3-8` — block → transactions → instructions):
  *   - scalar fields (`type name = tag;`), `repeated` markers;
  *   - NESTED messages (declared inline or referenced by name, dotted
  *     references like `Outer.Inner` supported) → nested `StructType`;
  *   - `enum` blocks → `StringType` columns (serde/BigQuery-style enum
  *     names, SURVEY §1.3), varint on the wire;
  *   - line/block comments, `syntax`/`package`/`option`/`import`/
  *     `reserved` headers.
  * `map<,>` and `oneof` are rejected loudly rather than mis-parsed, and
  * a RECURSIVE message tree is rejected (it has no finite StructType).
  */
object ProtoDescriptor {

  /** proto3 wire types (encoding spec §"Message Structure"). */
  object Wire {
    val Varint = 0 // int32/64, uint32/64, sint32/64, bool, enum
    val Fixed64 = 1 // fixed64, sfixed64, double
    val Len = 2 // string, bytes, embedded messages, packed repeated
    val Fixed32 = 5 // fixed32, sfixed32, float
  }

  private val ScalarTypes = Set(
    "int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool",
    "fixed64", "sfixed64", "double", "string", "bytes", "fixed32",
    "sfixed32", "float")

  /** A named enum block. proto3 requires the first value to be 0. */
  final case class EnumDef(name: String, values: Seq[(String, Int)]) {
    require(values.nonEmpty, s"enum $name: no values")
    require(values.head._2 == 0, s"enum $name: first value must be 0 (proto3)")
    require(values.map(_._1).distinct.size == values.size,
      s"enum $name: duplicate value names")
    // aliased numbers need proto3's allow_alias, which (like the other
    // exotic constructs) this descriptor deliberately rejects loudly —
    // nameOf would otherwise resolve an alias to whichever name is first
    require(values.map(_._2).distinct.size == values.size,
      s"enum $name: aliased value numbers (allow_alias unsupported)")
    def nameOf(n: Int): String =
      values.find(_._2 == n).map(_._1).getOrElse(
        throw new NoSuchElementException(s"enum $name: no value $n"))
    def numberOf(v: String): Int =
      values.find(_._1 == v).map(_._2).getOrElse(
        throw new NoSuchElementException(s"enum $name: no value '$v'"))
  }

  final case class Field(name: String, ptype: String, tag: Int,
      repeated: Boolean, message: Option[Message] = None,
      enumDef: Option[EnumDef] = None) {
    require(tag >= 1 && tag <= 536870911, s"field $name: tag $tag out of proto range")

    def wireType: Int =
      if (message.isDefined) Wire.Len
      else if (enumDef.isDefined) Wire.Varint
      else ptype match {
        case "int32" | "int64" | "uint32" | "uint64" | "sint32" | "sint64" |
            "bool" => Wire.Varint
        case "fixed64" | "sfixed64" | "double" => Wire.Fixed64
        case "string" | "bytes" => Wire.Len
        case "fixed32" | "sfixed32" | "float" => Wire.Fixed32
        case t => throw new IllegalArgumentException(
          s"field $name: unsupported proto3 type '$t'")
      }

    /** Zigzag-encoded on the wire? */
    def zigzag: Boolean = ptype == "sint32" || ptype == "sint64"

    /** The single tag byte (field << 3 | wire) — valid for tags ≤ 15,
      * which is all the engine's payload fields; larger tags need a
      * multi-byte varint and are rejected so the encoder's one-byte
      * writes can never silently truncate. */
    def tagByte: Byte = {
      require(tag <= 15, s"field $name: tag $tag needs a multi-byte tag varint")
      ((tag << 3) | wireType).toByte
    }

    def sparkType: DataType = {
      val base: DataType = message match {
        case Some(m) => m.sparkSchema
        case None => enumDef match {
          // serde/BigQuery-style: enums surface as their value NAMES
          case Some(_) => StringType
          case None => ptype match {
            case "int32" | "uint32" | "sint32" | "fixed32" | "sfixed32" => IntegerType
            // uint64 maps to LongType like Spark's own protobuf connector
            // (values beyond 2^63 reinterpret as negative — documented there)
            case "int64" | "uint64" | "sint64" | "fixed64" | "sfixed64" => LongType
            case "bool" => BooleanType
            case "float" => FloatType
            case "double" => DoubleType
            case "string" => StringType
            case "bytes" => BinaryType
            case t => throw new IllegalArgumentException(s"unsupported type '$t'")
          }
        }
      }
      if (repeated) ArrayType(base, containsNull = false) else base
    }
  }

  final case class Message(name: String, fields: Seq[Field]) {
    require(fields.map(_.tag).distinct.size == fields.size,
      s"message $name: duplicate field tags")
    require(fields.map(_.name).distinct.size == fields.size,
      s"message $name: duplicate field names")

    def field(n: String): Field =
      fields.find(_.name == n).getOrElse(
        throw new NoSuchElementException(s"message $name has no field '$n'"))

    /** Spark schema in DECLARATION order (prost emits struct fields the
      * same way; encode order is ascending tag, which the engine's
      * encoder sorts independently). */
    def sparkSchema: StructType =
      StructType(fields.map(f => StructField(f.name, f.sparkType, nullable = false)))
  }

  // ----- two-phase parser: raw tree, then resolved Messages -----

  private final case class RawField(name: String, tpe: String, tag: Int,
      repeated: Boolean)
  private final case class RawMsg(qualified: String, simple: String,
      fields: Vector[RawField])

  private val FieldRe =
    """^(repeated\s+)?([A-Za-z0-9_.]+)\s+([A-Za-z0-9_]+)\s*=\s*(\d+)\s*;$""".r
  private val MessageRe = """^message\s+([A-Za-z0-9_]+)\s*\{$""".r
  private val EnumRe = """^enum\s+([A-Za-z0-9_]+)\s*\{$""".r
  private val EnumValRe = """^([A-Za-z0-9_]+)\s*=\s*(\d+)\s*;$""".r

  /** Parse one .proto text; returns messages by name — top-level
    * messages under their simple name, nested messages under their
    * qualified `Outer.Inner` name (and simple name too when that is
    * unambiguous across the file). */
  def parse(text: String): Map[String, Message] = {
    // strip block comments, then line comments, then normalize
    val noBlock = raw"/\*([^*]|\*[^/])*\*/".r.replaceAllIn(text, " ")
    val lines = noBlock.linesIterator
      .map(l => l.indexOf("//") match {
        case -1 => l.trim
        case i => l.substring(0, i).trim
      })
      .filter(_.nonEmpty)
      .toSeq

    var rawMsgs = Vector.empty[RawMsg]
    var enums = Map.empty[String, EnumDef] // by qualified name
    // stack frames: Left(msg name + fields) for messages, Right for enums
    var stack = List.empty[(String, Either[Vector[RawField], Vector[(String, Int)]])]
    def scopePrefix: String = stack.reverse.map(_._1).mkString(".")
    def qualify(n: String): String =
      if (stack.isEmpty) n else s"$scopePrefix.$n"

    lines.foreach {
      case l if l.startsWith("syntax") && stack.isEmpty =>
        require(l.replace(" ", "").contains("\"proto3\""),
          s"only proto3 descriptors supported: $l")
      case l if (l.startsWith("package") || l.startsWith("option") ||
        l.startsWith("import") || l.startsWith("reserved")) &&
        stack.forall(_._2.isLeft) => ()
      case l if l.startsWith("option") => () // options legal in enums too
      case MessageRe(name) =>
        require(stack.forall(_._2.isLeft), s"message '$name' inside an enum")
        stack = (name, Left(Vector.empty[RawField])) :: stack
      case EnumRe(name) =>
        require(stack.forall(_._2.isLeft), s"enum '$name' inside an enum")
        stack = (name, Right(Vector.empty[(String, Int)])) :: stack
      case "}" =>
        stack match {
          case (name, Left(fs)) :: rest =>
            stack = rest
            rawMsgs :+= RawMsg(qualify(name), name, fs)
          case (name, Right(vs)) :: rest =>
            stack = rest
            enums += qualify(name) -> EnumDef(name, vs)
          case Nil => throw new IllegalArgumentException("stray '}'")
        }
      case l if l.startsWith("map<") || l.startsWith("map <") =>
        throw new IllegalArgumentException(
          s"map fields are unsupported (use a repeated key/value message): '$l'")
      case l if l.startsWith("oneof") =>
        throw new IllegalArgumentException(s"oneof is unsupported: '$l'")
      case EnumValRe(name, num) if stack.headOption.exists(_._2.isRight) =>
        val (ename, Right(vs)) = stack.head: @unchecked
        stack = (ename, Right(vs :+ (name -> num.toInt))) :: stack.tail
      case FieldRe(rep, tpe, name, tag) if stack.headOption.exists(_._2.isLeft) =>
        val (mname, Left(fs)) = stack.head: @unchecked
        stack = (mname, Left(fs :+ RawField(name, tpe, tag.toInt, rep != null))) ::
          stack.tail
      case l =>
        throw new IllegalArgumentException(s"unsupported .proto construct: '$l'")
    }
    require(stack.isEmpty, "unterminated message/enum block")

    val byQualified = rawMsgs.map(m => m.qualified -> m).toMap
    require(byQualified.size == rawMsgs.size, "duplicate message names")

    // resolve a type reference from inside message `from` (qualified):
    // innermost enclosing scope outward, then top level; dotted names
    // also match as qualified suffixes
    def resolveName(from: String, ref: String): Option[String] = {
      val scopes = {
        val parts = from.split('.')
        // from="A.B.C" → prefixes "A.B.C", "A.B", "A", ""
        (parts.indices.reverse.map(i => parts.take(i + 1).mkString("."))) :+ ""
      }
      scopes.iterator
        .map(s => if (s.isEmpty) ref else s"$s.$ref")
        .find(q => byQualified.contains(q) || enums.contains(q))
    }

    // resolve messages bottom-up with cycle detection
    var resolved = Map.empty[String, Message]
    var inProgress = Set.empty[String]
    def resolveMsg(qualified: String): Message = resolved.get(qualified).getOrElse {
      require(!inProgress.contains(qualified),
        s"recursive message '$qualified' cannot map to a finite StructType")
      inProgress += qualified
      val raw = byQualified(qualified)
      val fields = raw.fields.map { rf =>
        if (ScalarTypes.contains(rf.tpe))
          Field(rf.name, rf.tpe, rf.tag, rf.repeated)
        else resolveName(qualified, rf.tpe) match {
          case Some(q) if byQualified.contains(q) =>
            Field(rf.name, rf.tpe, rf.tag, rf.repeated,
              message = Some(resolveMsg(q)))
          case Some(q) =>
            Field(rf.name, rf.tpe, rf.tag, rf.repeated,
              enumDef = Some(enums(q)))
          case None => throw new IllegalArgumentException(
            s"message ${raw.simple}: field ${rf.name} has unknown type '${rf.tpe}'")
        }
      }
      inProgress -= qualified
      val m = Message(raw.simple, fields)
      resolved += qualified -> m
      m
    }
    rawMsgs.foreach(m => resolveMsg(m.qualified))

    // expose by qualified name, plus simple name when unambiguous
    val bySimple = rawMsgs.groupBy(_.simple).collect {
      case (s, Vector(only)) => s -> resolved(only.qualified)
    }
    rawMsgs.map(m => m.qualified -> resolved(m.qualified)).toMap ++ bySimple
  }

  /** Load + parse a descriptor from the classpath. */
  def load(resource: String): Map[String, Message] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"descriptor resource not found: $resource")
    try parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
