package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-local batches.
  *
  * The real decode/feature-extract step needs native media libraries that
  * are NOT in this container — it is STUBBED (deterministic fake clearly
  * marked below). Everything Spark-side is real and tested: the schema
  * contract, the batched iteration shape (mirroring a Pandas-UDF
  * `mapInPandas` batch boundary), partition locality, and the output
  * schema binding.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); batch size bounds per-call memory exactly like
  * `spark.sql.execution.arrow.maxRecordsPerBatch` does for Arrow batches;
  * decode parallelism == partition count, so repartition governs it.
  */
object Multimodal {

  /** The multimodal table contract: opaque payload + typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Deterministic synthetic asset table (offline stand-in for a binary
    * ingest): payload bytes are generated from the asset id. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val mod = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](64 + (i % 5) * 16)(j => ((i * 31 + j * 7) % 251).toByte)
      (i.toLong, mod, payload, (640 + i % 3, 480, 16000, "raw"))
    }.toDF("asset_id", "modality", "payload", "meta")
      .withColumn("meta", struct(
        col("meta._1").as("width"), col("meta._2").as("height"),
        col("meta._3").as("sample_rate"), col("meta._4").as("format")))
  }

  /** ===== STUB ===== The "decode + feature extract" kernel. A real
    * deployment replaces this body with an image/audio decoder (e.g.
    * JPEG→pixels→embedding); the media libraries are not present in this
    * container. The fake is deterministic in the payload bytes so specs
    * can assert exact values. The SIGNATURE — batch of (id, bytes) in,
    * fixed-width float feature out — is the real contract. */
  private def decodeBatchStub(batch: Seq[(Long, String, Array[Byte])]): Seq[(Long, String, Int, Array[Float])] =
    batch.map { case (id, mod, bytes) =>
      val dim = 8
      val feat = Array.tabulate[Float](dim) { d =>
        var acc = 0L
        var j = d
        while (j < bytes.length) { acc += (bytes(j) & 0xff) * (j + 1); j += dim }
        (acc % 1000).toFloat / 1000f
      }
      (id, mod, bytes.length, feat)
    }

  /** Registry entry (rows-only; the decode kernel is engine-internal):
    * synthetic assets → batched feature extraction → per-modality profile.
    * Deterministic in the asset ids, independent of sfDir. */
  def q54MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(syntheticAssets(s, 300).repartition(8))
    feats.groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_f0"))
      .orderBy(col("modality"))
  }

  /** Batched partition-local feature extraction: the mapInPandas shape
    * (iterator of bounded batches per partition) on the JVM. No shuffle;
    * the operator inherits upstream partitioning. */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id"), col("modality"), col("payload"))
      .rdd.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { group =>
          val batch = group.map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
          decodeBatchStub(batch).map { case (id, mod, n, feat) =>
            Row(id, mod, n, feat.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
