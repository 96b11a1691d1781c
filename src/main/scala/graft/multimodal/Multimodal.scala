package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batched kernels.
  *
  * The decode step is a STUB (no image/audio codecs in this environment):
  * `decodeStub` derives a deterministic pseudo-feature vector from the
  * bytes. The Spark-side plumbing — schema, partitioning, batch kernel
  * shape, metadata propagation — is real: swap `decodeStub` for a JNI/
  * native decoder and nothing else changes. At 100 TB the binary column
  * rides in parquet alongside its metadata; kernels run one partition at
  * a time with bounded memory.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  /** Wrap any (id, string payload) frame as a media table — used by tests
    * and as the pattern for real ingestion (payload bytes + metadata).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("content"),
      struct(lit("synthetic").as("source"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  val FeatureDim = 16

  /** STUB decoder: ??? in production — replaced by a real codec. Here a
    * deterministic byte-fold so tests can assert exact plumbing behavior.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction as a partition-batched kernel: one pass per
    * partition, primitive loops inside (the Scala analog of a pandas-batch
    * UDF — same batch shape, no per-row closure dispatch in the hot loop).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select(col("media_id"), col("media_type"), col("content")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          Row(r.getLong(0), r.getString(1),
            if (bytes == null) 0L else bytes.length.toLong,
            decodeStub(bytes).toSeq)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize" kernel (the image-downscale analog over opaque bytes): keep
    * every `factor`-th byte in a partition-batched primitive loop and
    * rewrite the metadata to match. STUB for a real resampling codec —
    * the content transform + metadata contract is what production swaps.
    */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("media_type"), col("content"),
        col("meta.source").as("source")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val out =
            if (bytes == null) null
            else Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
          Row(r.getLong(0), r.getString(1), out,
            Row(r.getString(3), if (out == null) 0L else out.length.toLong))
        }
      }
    spark.createDataFrame(rdd, MediaSchema)
  }

  /** Deterministic frame sampling for video-like media: n evenly-spaced
    * byte offsets per item (the plumbing for keyframe extraction —
    * explode(sequence), fully declarative).
    */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("n_bytes", col("meta.n_bytes"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("byte_offset",
        (col("frame_idx") * greatest(col("n_bytes"), lit(1L)) / n).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("byte_offset"), col("media_type"))
}
