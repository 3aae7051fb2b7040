package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `BinaryType` columns with a typed metadata struct beside them; decode /
  * feature-extract run per-partition in batches.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * operator signatures) is real and tested. Image decoding is REAL
  * ([[MultimodalOps.ImageIoDecoder]], JDK `javax.imageio` — PNG/JPEG/GIF/
  * BMP header decode, no external dependency), and so is uncompressed
  * audio ([[MultimodalOps.WavDecoder]], JDK `javax.sound.sampled` —
  * WAV/AIFF/AU header decode); [[MultimodalOps.ModalityRoutingDecoder]]
  * routes each payload to its modality's codec. Video and compressed
  * audio codecs aren't available in this container, so
  * [[MultimodalOps.StubDecoder]] remains the deterministic
  * oracle-checkable stand-in for those (and for the gate, whose testdata
  * payloads are md5-derived pseudo-media, not real media bytes); a
  * JNI/ffmpeg decoder drops in behind the same trait.
  */
object MultimodalOps {

  /** RECOMMENDED staging schema for a media table (payload + typed
    * nested meta) — an API contract for ingest writers, not the shape
    * [[decodeMeta]] returns (that emits the meta fields FLAT, the join-
    * friendly form). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))), nullable = true)))

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, sampleRate: Int)

  /** Pluggable codec boundary. Implementations MUST be deterministic and
    * serializable (they run inside executors). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): MediaMeta
  }

  /** STUB decoder: derives pseudo-dimensions from the payload bytes.
    * Deterministic stand-in for a real image/audio codec. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): MediaMeta = {
      def ub(i: Int): Int = if (payload.length > i) payload(i) & 0xff else 0
      MediaMeta(
        width = ub(0) * 16 + 64,
        height = ub(1) * 16 + 64,
        nFrames = if (mediaType == "video") ub(2) + 1 else 1,
        sampleRate = if (mediaType == "audio") 8000 + ub(3) * 128 else 0)
    }
  }

  /** REAL image decoder on the JDK's `javax.imageio` — no external
    * dependency: an `ImageReader` is bound to the payload header and asked
    * for dimensions, so only the header is parsed, never the full raster
    * (cheap even for multi-megabyte frames). Handles every format the JDK
    * ships readers for (PNG, JPEG, GIF, BMP, WBMP). Still images report
    * `nFrames = 1` and `sampleRate = 0`; an undecodable payload is a
    * deterministic error (surface bad rows, never fabricate dimensions).
    * Audio/video codecs remain out of scope for this container —
    * [[StubDecoder]] stays as the oracle-checkable stand-in. */
  object ImageIoDecoder extends MediaDecoder {
    // one-time, not per decode: setUseCache is a JVM-GLOBAL toggle (it
    // affects every ImageIO user in the executor) and re-setting it per
    // row is pure overhead on the hot path
    javax.imageio.ImageIO.setUseCache(false) // no executor-disk staging

    def decode(payload: Array[Byte], mediaType: String): MediaMeta = {
      require(payload != null && payload.nonEmpty, "empty media payload")
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"no ImageIO codec recognizes payload (mediaType=$mediaType)")
        val r = readers.next()
        try {
          r.setInput(in, true, true)
          MediaMeta(r.getWidth(0), r.getHeight(0), nFrames = 1, sampleRate = 0)
        } finally r.dispose()
      } finally in.close()
    }
  }

  /** REAL audio decoder on the JDK's `javax.sound.sampled` — no external
    * dependency: the container format header (WAV/AIFF/AU, every format
    * the JDK ships SPI readers for) is parsed for sample rate and PCM
    * frame count; the sample data itself is never read (header-only, same
    * cheapness contract as [[ImageIoDecoder]]). `nFrames` carries the PCM
    * frame count (duration = nFrames / sampleRate); an unrecognized
    * payload is a deterministic error. Compressed codecs (MP3/AAC/Opus)
    * have no JDK SPI — those stay behind [[StubDecoder]] until an ffmpeg
    * bridge drops in behind the same trait. */
  object WavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): MediaMeta = {
      require(payload != null && payload.nonEmpty, "empty media payload")
      val in = try
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"no javax.sound codec recognizes payload (mediaType=$mediaType)", e)
      }
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        // both sentinels normalize: getFrameLength AND getSampleRate can
        // report AudioSystem.NOT_SPECIFIED (-1), and a -1 sample rate
        // leaking through breaks the "sampleRate=0 means non-audio"
        // convention and any duration = frames/rate arithmetic
        MediaMeta(width = 0, height = 0,
          nFrames = if (frames < 0) 0 else math.min(frames, Int.MaxValue).toInt,
          sampleRate = math.max(0, fmt.getSampleRate.toInt))
      } finally in.close()
    }
  }

  /** Routes each payload to the real codec for its modality — the decoder
    * the production pipeline binds: images through `javax.imageio`, audio
    * through `javax.sound.sampled`, anything else (video — no JDK codec)
    * through the stub. One instance serializes into the `mapPartitions`
    * batch exactly like any single-codec decoder. */
  object ModalityRoutingDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mediaType: String): MediaMeta =
      mediaType match {
        case "image" => ImageIoDecoder.decode(payload, mediaType)
        case "audio" => WavDecoder.decode(payload, mediaType)
        case _ => StubDecoder.decode(payload, mediaType)
      }
  }

  /** Wrap a text/blob column as a media payload (for testdata, which has
    * no true binary column: payload := md5 bytes of the text). */
  def fakePayload(content: Column): Column = unhex(md5(content))

  /** Batch decode via `mapPartitions` — the Scala-native equivalent of a
    * pandas-batch UDF: one decoder instance per partition, streaming
    * iterator (no per-row setup, no full-partition materialization). */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String,
      typeCol: String, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol), col(typeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mt) =>
          // a NULL payload is "no media", not "empty media": every decoder
          // gets the same contract — null meta fields — instead of the
          // real codecs rejecting the row (context-free stage failure)
          // while the stub fabricates 64x64 dims for it
          if (payload == null)
            (id, mt, Option.empty[Int], Option.empty[Int],
              Option.empty[Int], Option.empty[Int])
          else {
            val m = decoder.decode(payload, mt)
            (id, mt, Some(m.width), Some(m.height), Some(m.nFrames),
              Some(m.sampleRate))
          }
        }
      }
      .toDF("media_id", "media_type", "width", "height", "n_frames", "sample_rate")
  }

  /** Pure-expression twin of [[decodeMeta]]+[[StubDecoder]]: the same
    * pseudo-metadata computed as codegen'd Column expressions, used as the
    * oracle-checkable face of the stub (and the fast path when the "decode"
    * is metadata-only). byte_i(payload) = conv(hex pair i, 16, 10). */
  def stubMetaColumns(payloadHex: Column, mediaType: Column): Seq[(String, Column)] = {
    // rpad: a payload shorter than 4 bytes must match StubDecoder's
    // zero-padding (conv("") is NULL in Spark, not 0)
    val padded = rpad(payloadHex, 8, "0")
    def ub(i: Int): Column =
      conv(substring(padded, 2 * i + 1, 2), 16, 10).cast(IntegerType)
    Seq(
      "width" -> (ub(0) * 16 + 64),
      "height" -> (ub(1) * 16 + 64),
      "n_frames" -> when(mediaType === "video", ub(2) + 1).otherwise(1),
      "sample_rate" -> when(mediaType === "audio", lit(8000) + ub(3) * 128).otherwise(0))
  }

  /** Frame sampling plan for video-ish payloads: every `stride`-th frame
    * index as an array column — the shape a real frame extractor consumes. */
  def frameSamplePlan(nFrames: Column, stride: Int): Column = {
    require(stride > 0,
      s"frame-sample stride must be positive, got $stride") // fail at build, not per row
    when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
      .otherwise(array().cast(ArrayType(IntegerType)))
  }
}
