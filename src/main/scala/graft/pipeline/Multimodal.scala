package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (BASELINE.json north-star surface): treat
  * image/audio/video payloads as opaque `binary` columns plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample are
  * the pluggable stages.
  *
  * IMAGE decode is REAL: PNG/JPEG/GIF/BMP through the JDK's own
  * `javax.imageio` ([[graft.functions.ImageDecode]] — width, height,
  * channels, mean luma; corrupt payloads decode to null, never fail the
  * scan). What remains STUBBED (clearly marked below) is what the JDK
  * genuinely cannot do without external codecs: audio/video decode and
  * learned feature embeddings — the stub is a deterministic fake with
  * the same schema, partitioning, and batch shape, so swapping in a
  * JNI/FFI decoder changes no plan shape.
  *
  * Scale notes: payload bytes never pass through a shuffle — features are
  * extracted in the scan stage and the binary column is dropped before
  * any wide operation; `spark.sql.files.maxPartitionBytes` governs batch
  * size per task. */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a text/binary source column as a multimodal payload with
    * metadata. In production this is `spark.read.format("binaryFile")` or
    * a parquet binary column; for the test tables we synthesize the bytes
    * from text so the plumbing is exercised end-to-end. */
  def asPayload(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("content", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))

  /** REAL image decode (JDK ImageIO — PNG/JPEG/GIF/BMP): struct of
    * (width, height, channels, mean_luma), null for undecodable bytes.
    * A codegen-resident expression; the bytes stay in the scan stage. */
  def decodeImage(content: Column): Column =
    graft.functions.ImageDecode(content)

  /** ======== STUB (audio/video + learned features ONLY) ========
    * Deterministic fake "decode + feature extract" for payloads the JDK
    * has no codec for (audio/video) and for learned embedding features
    * (which need a model, not a codec): real decoders produce a
    * fixed-length float feature vector per payload; the stub derives one
    * from byte statistics (length, hash bytes) so it is stable across
    * runs/engines. Replace with a real codec behind the same signature.
    * The surrounding plan (projection in scan stage, no shuffle of bytes)
    * is the production shape. Image DIMENSIONS/luma are real — see
    * [[decodeImage]]. */
  def decodeStub(content: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      (pmod(xxhash64(content, i), lit(1000)).cast("double") / 500.0) - 1.0)

  /** Byte-level features that need no codec (real, not stubbed). */
  def byteFeatures(content: Column): Column = struct(
    length(content).as("n_bytes"),
    crc32(content).as("crc"),
    md5(content).as("digest"))

  /** ======== STUB ========
    * Frame sampling plan: offsets of frames to decode given a duration and
    * fps — the planning arithmetic is real; the decode of each frame would
    * go through `decodeStub`'s production replacement. */
  def frameSampleOffsets(durationMs: Column, everyMs: Long): Column =
    when(durationMs.isNull || durationMs <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), durationMs - 1, lit(everyMs)))

  /** Fixed-window chunking of a binary payload — the audio/video frame
    * window shape (REAL plumbing, no codec needed): one output row per
    * `chunkBytes` window carrying its index and exact byte slice, ready
    * for a per-chunk decoder/featurizer. Entirely scan-stage
    * (sequence + explode + binary substring, all codegen'd); payload
    * bytes still never cross a shuffle — extract per-chunk features
    * before anything wide, then drop the slice. Null or zero-length
    * payloads produce no chunk rows (explode of an empty sequence).
    * Output adds `chunk_idx` (0-based) and `chunk` (binary, full
    * `chunkBytes` except a shorter final window). */
  def chunkPayload(df: DataFrame, contentCol: String,
                   chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    val n = length(col(contentCol))
    df.withColumn("chunk_idx", explode(
        when(col(contentCol).isNull || n === 0,
          array().cast("array<int>"))
        .otherwise(sequence(lit(0),
          ((n - 1) / chunkBytes).cast("int")))))
      .withColumn("chunk",
        col(contentCol).substr(col("chunk_idx") * chunkBytes + 1,
          lit(chunkBytes)))
  }

  /** Full pipeline: payload -> features, dropping the heavy bytes before
    * anything wide happens. `mapPartitions`-free: all stages are scan-time
    * projections, so Catalyst keeps them in one WholeStageCodegen span.
    * Image payloads additionally get the REAL decoded metadata
    * (`image_meta`: width/height/channels/mean_luma via JDK ImageIO);
    * other mimes carry a typed null there. */
  def extract(df: DataFrame, srcCol: String, mime: String,
              dims: Int = 8): DataFrame =
    asPayload(df, srcCol, mime)
      .withColumn("features", decodeStub(col("content"), dims))
      .withColumn("byte_stats", byteFeatures(col("content")))
      .withColumn("image_meta",
        if (mime.startsWith("image/")) decodeImage(col("content"))
        else lit(null).cast(graft.functions.ImageDecode.schema))
      .drop("content")
}
