package graft.sources

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** T6 inverse — distributed Avro container SOURCE. The sink
  * (graft.sinks.AvroSink) writes one container file per partition; this
  * reads a directory of them back as a DataFrame with the original
  * StructType, so an engine round-trip (sink → source) loses nothing.
  * Uses the same bundled avro-1.12.1 core (the spark-avro connector jar
  * is not available offline).
  *
  * All I/O goes through the Hadoop FileSystem API (listing on the
  * driver, FsInput-backed readers on executors, the Hadoop conf shipped
  * via broadcast), so the source works against any cluster filesystem
  * (HDFS, object stores, local) — not only when driver and executors
  * share a local disk.
  *
  * Scale: files parallelize one-per-task (a container file is one
  * upstream partition's output, so this preserves the writer's
  * parallelism); each task streams its file through GenericDatumReader.
  * Records are materialized per file before the reader closes — bounded
  * by the sink's partition size by construction.
  */
object AvroSource {

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val files =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString).sorted
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hconf))
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(path), confBc.value.value),
          new GenericDatumReader[GenericRecord]())
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
