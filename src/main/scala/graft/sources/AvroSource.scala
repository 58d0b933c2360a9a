package graft.sources

import java.io.File

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** T6 inverse — distributed Avro container SOURCE. The sink
  * (graft.sinks.AvroSink) writes one container file per partition; this
  * reads a directory of them back as a DataFrame with the original
  * StructType, so an engine round-trip (sink → source) loses nothing.
  * Uses the same bundled avro-1.12.1 core (the spark-avro connector jar
  * is not available offline).
  *
  * Scale: files parallelize one-per-task (a container file is one
  * upstream partition's output, so this preserves the writer's
  * parallelism); each task streams its file through GenericDatumReader.
  * Records are materialized per file before the reader closes — bounded
  * by the sink's partition size by construction.
  */
object AvroSource {

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted.toSeq
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        val reader = new DataFileReader[GenericRecord](
          new File(path), new GenericDatumReader[GenericRecord]())
        try reader.iterator().asScala.map(rowOf(_, schema)).toList
        finally reader.close()
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Avro generic datum → Row under the target StructType, undoing the
    * sink's representation choices (Utf8 → String, ByteBuffer → bytes,
    * epoch-micros long → Timestamp with true micros). */
  private def rowOf(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      (rec.get(f.name), f.dataType) match {
        case (null, _) => null
        case (u: org.apache.avro.util.Utf8, StringType) => u.toString
        case (bb: java.nio.ByteBuffer, BinaryType) =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case (m: java.lang.Long, TimestampType) =>
          val ts = new java.sql.Timestamp(Math.floorDiv(m, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
          ts
        case (v, _) => v
      }
    })
}
