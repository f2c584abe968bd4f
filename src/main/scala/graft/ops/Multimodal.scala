package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for a training-data pipeline:
  * media payloads are opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as
  * per-partition batch transforms over typed Datasets
  * (`mapPartitions` — the JVM analog of `mapInPandas`: one iterator per
  * partition, so per-batch setup like codec/model initialization is paid
  * once per partition, not per row).
  *
  * The actual byte→pixels decode is STUBBED (no image/audio codecs in this
  * environment): [[MediaCodec.decodeStub]] derives deterministic fake
  * "samples" from the payload bytes. Everything around the stub — schema,
  * partitioning, batch iteration shape, typed Encoders, metadata handling —
  * is real and tested, so swapping in a real codec is a one-function change.
  *
  * Scale notes: payloads never shuffle (all transforms are narrow,
  * partition-local); features are fixed-width vectors so downstream joins
  * move KB not MB; frame sampling explodes only the sampled offsets, never
  * materializes per-frame payload copies.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      format: String, // png | wav | mp4 (stub formats)
      width: Int,
      height: Int,
      content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      mean_byte: Double,
      byte_histogram: Array[Double])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      byte_offset: Int,
      frame_len: Int)

  val FrameBytes = 256
  val FrameSampleEvery = 4
  val HistogramBins = 16

  /** The stubbed decoder: in production this is the codec call
    * (JPEG/PNG decode, PCM frames, …). Here it deterministically fakes
    * "samples" = the raw payload bytes. Marked as the single swap point.
    */
  object MediaCodec {
    /** STUB — replace with a real codec. Returns the byte stream that a
      * real decode would turn into pixels/samples.
      */
    def decodeStub(content: Array[Byte]): Array[Byte] = content
  }

  /** Derive a deterministic media table from the documents corpus: payload
    * = UTF-8 text bytes, kind cycles image/audio/video, dimensions derive
    * from payload size. Stands in for `spark.read.format("binaryFile")` on
    * a real media lake.
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 32).cast("int").as("height"),
      // null text = missing media → EMPTY payload (coalesce on both
      // sides): the decode path sees zero bytes instead of NPE'ing
      encode(coalesce(col("text"), lit("")), "UTF-8").as("content"))

  /** Decode + feature-extract per partition: n_bytes, mean byte value and a
    * normalized 16-bin byte histogram per media row. The iterator shape is
    * the real thing — batch-local buffers, one pass over the payload.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (in production: codec/model init)
      val histBuf = new Array[Long](HistogramBins)
      rows.map { m =>
        java.util.Arrays.fill(histBuf, 0L)
        val decoded = MediaCodec.decodeStub(m.content)
        var sum = 0L
        var i = 0
        while (i < decoded.length) {
          val b = decoded(i) & 0xff
          sum += b
          histBuf(b * HistogramBins / 256) += 1
          i += 1
        }
        val n = decoded.length
        MediaFeatures(
          m.media_id,
          m.kind,
          n,
          if (n == 0) 0.0 else sum.toDouble / n,
          histBuf.map(c => if (n == 0) 0.0 else c.toDouble / n))
      }
    }
  }

  /** Typed view of a media DataFrame. */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }

  /** Feature extraction as a DataFrame op (the `queries()` surface). */
  def mediaFeatures(documents: DataFrame): DataFrame = {
    val feats = extractFeatures(asMedia(mediaFromDocuments(documents)))
    feats.toDF().select(
        col("media_id"), col("kind"), col("n_bytes"),
        col("mean_byte"), col("byte_histogram"))
      .orderBy("media_id")
  }

  /** Metadata-only projection of [[mediaFeatures]] that a SQL oracle can
    * mirror (payload length is text length for the UTF-8 stub payloads).
    */
  def mediaFeaturesMeta(documents: DataFrame): DataFrame =
    mediaFeatures(documents).select("media_id", "kind", "n_bytes")

  def mediaFeaturesMetaSql: String =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CAST(octet_length(encode(coalesce(text, ''))) AS INT) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  /** Resize stub for image rows: scale metadata to fit `maxDim` and stride-
    * subsample the payload accordingly (a real impl would resample pixels;
    * the plumbing — narrow, partition-local, metadata-consistent — is what
    * matters here).
    */
  def resize(media: Dataset[MediaRow], maxDim: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.width, m.height) <= maxDim) m
      else {
        val scale = maxDim.toDouble / math.max(m.width, m.height)
        val stride = math.max(1, math.round(1.0 / scale).toInt)
        val out = Array.range(0, m.content.length, stride).map(m.content)
        m.copy(
          width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt),
          content = out)
      }
    }
  }

  /** Frame sampling for video rows: fixed-size frames, every k-th sampled.
    * Only offsets/lengths are produced — the payload is never copied per
    * frame (at scale the sampled frame extraction happens in the same
    * partition-local pass that decodes).
    */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = (m.content.length + FrameBytes - 1) / FrameBytes
      (0 until nFrames by FrameSampleEvery).map { idx =>
        val off = idx * FrameBytes
        Frame(m.media_id, idx, off, math.min(FrameBytes, m.content.length - off))
      }
    }
  }

  def frameSample(documents: DataFrame): DataFrame =
    sampleFrames(asMedia(mediaFromDocuments(documents)))
      .toDF()
      .orderBy("media_id", "frame_idx")

  def frameSampleSql: String =
    s"""SELECT media_id, CAST(f AS INT) AS frame_idx,
       |  CAST(f * $FrameBytes AS INT) AS byte_offset,
       |  CAST(least($FrameBytes, n_bytes - f * $FrameBytes) AS INT) AS frame_len
       |FROM (
       |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
       |  FROM documents WHERE doc_id % 3 = 2),
       |  LATERAL (SELECT unnest(generate_series(0,
       |    CAST(ceil(CAST(n_bytes AS DOUBLE) / $FrameBytes) AS BIGINT) - 1,
       |    $FrameSampleEvery)) AS f)
       |ORDER BY media_id, frame_idx""".stripMargin
}
