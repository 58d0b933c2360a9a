package graft.sinks

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import java.io.File
import scala.jdk.CollectionConverters._

/** T6 — Avro serialization (etl-rust `src/output/google_pubsub.rs:175-184`,
  * schema loading `avro_helpers.rs:4-23`): each record wrapped in an Avro
  * container with a per-table schema.
  *
  * The spark-avro connector jar is not available offline, so this uses the
  * bundled avro-1.12.1 core directly: the table's StructType is converted
  * to an Avro record schema once on the driver (the single
  * schema-source-of-truth contract — "protobuf schema matches avro
  * schema", google_pubsub.rs:180), then each partition writes one
  * container file via foreachPartition — connection-per-partition
  * lifecycle again.
  *
  * Supported field types: the reference's record surface (long/int/
  * double/string/boolean/binary, nullable). Nested structs/arrays would
  * extend the same conversion; the tables this engine fans out are flat
  * at the sink boundary.
  */
object AvroSink {

  def avroSchema(tableName: String, st: StructType): Schema = {
    var fields = SchemaBuilder.record(tableName).namespace("graft").fields()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case TimestampType => Schema.create(Schema.Type.LONG) // epoch micros (INT_TIMESTAMP mode)
        case other => throw new IllegalArgumentException(
          s"AvroSink: unsupported type $other for field ${f.name}")
      }
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  /** Write each partition as one Avro container file under dir. */
  def write(df: DataFrame, dir: String, tableName: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(tableName, st).toString // Schema isn't serializable-friendly; ship JSON
    new File(dir).mkdirs()
    df.foreachPartition { (rows: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, new File(dir, f"part-$pid%05d.avro"))
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case TimestampType =>
                // true epoch micros: getTime carries only millis; the
                // sub-millisecond digits live in getNanos
                val ts = row.getTimestamp(i)
                Long.box(ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
              case BinaryType    => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _             => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(f.name, v)
        }
        writer.append(rec)
      } finally writer.close()
    }
  }

  /** Read back all container files in dir (test/verification helper). */
  def readAll(dir: String): Seq[Map[String, Any]] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val reader = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
      try reader.iterator().asScala.map { rec =>
        rec.getSchema.getFields.asScala.map { fld =>
          val v = rec.get(fld.name) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case other => other
          }
          fld.name -> v
        }.toMap
      }.toList
      finally reader.close()
    }
  }
}
