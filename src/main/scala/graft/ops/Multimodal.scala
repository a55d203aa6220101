package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, batched feature extraction over partitions.
 *
 * The Spark-side plumbing — schema, batching shape, partition-parallel
 * execution, deterministic output — is real and tested. The codec itself is
 * STUBBED (this container ships no image/audio libraries): `decodeStub`
 * derives a deterministic per-byte histogram + "resized" prefix instead of a
 * JPEG decode. Swapping in a real decoder changes only that one function;
 * everything around it (mapPartitions batch loop, schema, feature width) is
 * the production shape. In PySpark this layer would be `mapInPandas` with
 * arrow batches; the Scala-native equivalent is mapPartitions over grouped
 * iterators, which preserves the same batch amortization without
 * serialization hops.
 */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 32
  val ResizePrefix = 64

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Derive a media table from a documents table: payload = utf-8 bytes of
    * the text (an opaque deterministic stand-in for image bytes). */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"),
      (length(col("text")) % 640 + 1).cast("int").as("width"),
      (length(col("text")) % 480 + 1).cast("int").as("height"))

  /** STUB decoder: deterministic byte histogram folded to FeatureDim floats,
    * normalized by byte count. A real build replaces exactly this function
    * with the image/audio codec call. */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % FeatureDim) += 1
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** "Resize": deterministic downsample = first ResizePrefix bytes (stub for
    * an actual resample). */
  private[ops] def resizeStub(payload: Array[Byte]): Array[Byte] =
    payload.take(ResizePrefix)

  val FrameBytes = 256
  val FrameEvery = 4

  /**
   * Frame sampling (video-analog): treat the payload as a sequence of
   * fixed-size chunks ("frames") and emit every `every`-th one. Pure column
   * expressions — `sequence` generates the sampled indices and a codegen'd
   * substring slices the bytes, so sampling never leaves whole-stage
   * codegen and never materializes unsampled frames. A real video build
   * replaces the chunking with keyframe offsets from the container index;
   * the explode/slice plumbing is the production shape.
   */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int = FrameBytes,
      every: Int = FrameEvery): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        ceil(length(col("payload")).cast("double") / frameBytes)
          .cast("int").as("nchunks"))
      .filter(col("nchunks") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("nchunks") - 1, lit(every))).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))

  /**
   * Batched feature extraction: mapPartitions with an explicit batch loop
   * (the codec amortization point — a real decoder initializes once per
   * partition, processes BatchSize items per call).
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // per-partition "codec init" would go here
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          Row(id, payload.length.toLong, resizeStub(payload),
            decodeStub(payload).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
