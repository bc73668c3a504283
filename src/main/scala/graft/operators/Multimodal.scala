package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, processed in partition-sized
 * batches.
 *
 * The DECODE step is a clearly marked STUB — real codecs (JPEG/PNG/WAV/
 * mp4) are not available in this environment. What IS real, and what this
 * module exercises end-to-end: the schema contract, the batched
 * per-partition execution shape (`mapPartitions` over an iterator — the
 * Scala twin of a pandas-batch UDF: no per-row setup cost, bounded
 * memory), deterministic outputs for testing, and the partitioning
 * controls a 100 TB media corpus needs (payloads never shuffle unless the
 * caller asks).
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))),
      nullable = true)))

  /** Output schema of [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("payload_hash", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /**
   * STUB decoder ???: stands in for image decode / audio PCM read. Real
   * implementation would parse `payload` with a codec; this deterministic
   * fake derives a byte histogram so tests have stable expectations.
   * Marked clearly so it is never mistaken for a real codec.
   */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % dim) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < dim) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /**
   * Batched feature extraction over media rows: one pass per partition,
   * iterator-to-iterator (constant memory, no per-row driver round trips).
   * The 100 TB shape: payloads stay where they were read; only the small
   * (id, hash, features) projection continues downstream.
   */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "kind", "payload").rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1), payload.length,
            // xxhash-free deterministic payload id (simple FNV-1a)
            {
              var h = 0xcbf29ce484222325L
              var i = 0
              while (i < payload.length) {
                h ^= (payload(i) & 0xFFL); h *= 0x100000001b3L; i += 1
              }
              h
            },
            decodeStub(payload, dim))
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Resize stub for images: records intended dimensions in metadata and
    * re-extracts features — the ??? decode is the stubbed step; the
    * metadata/lineage plumbing is real. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      when(col("kind") === "image",
        struct(lit(w).as("width"), lit(h).as("height"),
          col("meta.duration_ms").as("duration_ms")))
        .otherwise(col("meta")))

  /** Frame-sample stub for videos: every `everyMs` ms up to the recorded
    * duration — emits one row per sampled frame offset (the generator
    * shape a real frame extractor would follow). */
  def sampleFrames(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0),
          coalesce(col("meta.duration_ms"), lit(0)), lit(everyMs)))
          .as("frame_ms"))

  /** Builds a demo media table from the documents fixture (text bytes as
    * payloads) — lets every pipeline stage run end-to-end without codecs. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).cast("int").as("width"),
        lit(64).cast("int").as("height"),
        (length(col("text")) * 10).cast("int").as("duration_ms")).as("meta"))
}
