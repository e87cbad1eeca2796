package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing: media as opaque BINARY columns with
  * typed metadata, batched per-partition decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The IMAGE path is real: PNGs are encoded and decoded with the
  * JDK's `javax.imageio` codec (no external deps), and the decode /
  * resize stages are oracle-gated — the PNG corpus is generated with
  * dimensions and fill color that are closed-form functions of
  * `doc_id`, so DuckDB can state the expected decoded output without
  * running a codec, while the Spark side round-trips real PNG bytes.
  * The execution shape is the 100 TB one:
  *  - media rides in a `BINARY` column inside the row (at production
  *    scale you'd point at object-store keys instead once blobs exceed
  *    a few MB, same schema otherwise);
  *  - codecs run via `mapPartitions` on a typed Dataset — one
  *    iterator per partition, so codec/reader state amortizes per
  *    partition exactly like a Pandas-UDF batch would;
  *  - downstream of the decode it's columnar aggregates again.
  *
  * The VIDEO path is real over a deterministic container: the JDK
  * ships no video codec, so "video" is defined as concatenated
  * length-prefixed PNG frames (4-byte big-endian length + codec
  * bytes per frame — the moral shape of an MP4's sample table,
  * reduced to its essence). Frame SAMPLING is genuine: the sampler
  * walks the length prefixes and slices out only the sampled frames
  * (unsampled frames are never decoded — the property that matters
  * when a frame is megabytes), and per-frame stats decode the
  * sampled PNGs with the same `javax.imageio` codec as the image
  * path. Frame geometry/fill are closed-form in (doc_id, frame_idx),
  * so mm1/mm2 are content-exact oracles like mm3/mm4.
  */
object Multimodal {

  /** A media blob + its typed metadata (the ingest-side schema). */
  case class MediaRecord(media_id: Long, source: String,
                         mime: String, content: Array[Byte])

  /** Extracted per-media features (the post-decode schema). */
  case class MediaFeature(media_id: Long, source: String, n_bytes: Long,
                          width: Int, height: Int, checksum: Long)

  private val PngMime = "image/png"
  private val JpegMime = "image/jpeg"

  /** The explicit JPEG encode quality (a real corpus pins this in its
    * ingest config; the exactness property below holds at ANY
    * quality, so the value is not load-bearing for the oracle). */
  private[graft] val JpegQuality = 0.9f

  /** Per-partition image codec with CACHED reader/writer instances.
    * `ImageIO.read`/`write` pay a service-registry scan plus
    * disk-cache-policy stream construction on EVERY call — at hundreds
    * of thousands of small blobs per partition that overhead dominates
    * the actual codec work. One `PngCodec` per `mapPartitions` call
    * amortizes it to zero-per-blob, which is precisely why the decode
    * stages run as per-partition iterators and not per-row UDFs. Not
    * thread-safe — one instance per partition iterator, never shared.
    *
    * JPEG (r15 verdict #5 — a real 100 TB image corpus is mostly
    * JPEG): same cached-instance discipline, lazily initialized so
    * PNG-only stages never pay for the JPEG plugin. JPEG is LOSSY, so
    * hash gates over it need an exactness property, not hope: a
    * UNIFORM GRAY image round-trips bit-exactly through the JDK
    * codec at any quality — gray means zero chroma (Cb = Cr = 128
    * exactly, and 4:2:0 subsampling of a constant plane is that same
    * constant), and a constant luma plane is DC-only per block, with
    * the level-shifted DC a multiple of every quantizer's step after
    * rounding, so dequantization reproduces it exactly (verified for
    * all 256 gray values × edge geometries × qualities
    * 0.75/0.9/0.95/1.0 — PipelineSpec pins the property at the gate
    * quality). The mm5 fixture therefore fills JPEGs with
    * id-derived GRAY, keeping the DuckDB oracle closed-form while
    * the Spark side runs the genuine lossy codec. */
  private final class PngCodec {
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private lazy val jpegReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
    private lazy val jpegWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()

    private def readWith(r: javax.imageio.ImageReader,
        bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        r.setInput(iis, true, true)
        r.read(0)
      } catch {
        case _: java.io.IOException => null // corrupt blob: fall back
      } finally iis.close()
    }

    /** Decode PNG bytes; null on undecodable input (the `ImageIO.read`
      * contract the fallback paths rely on). */
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      readWith(reader, bytes)

    def decodeJpeg(bytes: Array[Byte]): java.awt.image.BufferedImage =
      readWith(jpegReader, bytes)

    /** Mime-keyed decode — the mixed-corpus entry point. */
    def decodeMime(mime: String, bytes: Array[Byte]): java.awt.image.BufferedImage =
      mime match {
        case PngMime => decode(bytes)
        case JpegMime => decodeJpeg(bytes)
        case _ => null
      }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(img)
        ios.flush()
      } finally ios.close()
      bos.toByteArray
    }

    /** JPEG encode at an explicit quality (the corpus-ingest shape —
      * quality is a pipeline parameter, never a codec default). */
    def encodeJpeg(img: java.awt.image.BufferedImage,
        quality: Float = JpegQuality): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        jpegWriter.setOutput(ios)
        val p = jpegWriter.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        jpegWriter.write(null,
          new javax.imageio.IIOImage(img, null, null), p)
        ios.flush()
      } finally ios.close()
      bos.toByteArray
    }
  }

  /** Sum of RGB channel values over all pixels. The decoded PNG
    * raster is TYPE_3BYTE_BGR with a compact data buffer — summing
    * its bytes directly IS the channel sum (B+G+R per pixel), with no
    * per-pixel `getRGB` sync/color-model conversion. Any other
    * raster shape falls back to one bulk `getRGB` call. */
  private def pixelSum(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    img.getRaster.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            db.getData.length == w * h * 3 =>
        val a = db.getData
        var s = 0L
        var i = 0
        while (i < a.length) { s += (a(i) & 0xff); i += 1 }
        s
      case _ =>
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var s = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          i += 1
        }
        s
    }
  }

  /** Closed-form PNG geometry/fill from the id — the contract shared
    * by the Spark-side generator and the DuckDB oracle. */
  private def pngWidth(id: Long): Int = 8 + (id % 25).toInt
  private def pngHeight(id: Long): Int = 8 + ((id * 7) % 25).toInt
  private def pngRgb(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, ((id * 31) % 256).toInt, ((id * 101) % 256).toInt)

  /** Batched decoder. PNG blobs go through the REAL `javax.imageio`
    * codec (width/height from the decoded raster, checksum = sum of
    * RGB channel values over all pixels); other mimes fall back to
    * codec-free byte statistics (length + rolling byte hash) — the
    * honest treatment for blobs this container cannot decode.
    */
  private def decode(it: Iterator[MediaRecord]): Iterator[MediaFeature] = {
    // per-partition codec state: ONE reader instance for the whole
    // iterator — the codec-amortization point of mapPartitions
    val codec = new PngCodec
    def byteStats(r: MediaRecord): MediaFeature = {
      var cs = 1125899906842597L
      var i = 0
      while (i < r.content.length) { cs = cs * 31 + (r.content(i) & 0xff); i += 1 }
      MediaFeature(r.media_id, r.source, r.content.length.toLong,
        width = 0, height = 0, checksum = cs)
    }
    it.map { r =>
      // codec.decode returns NULL on undecodable bytes — a corrupt
      // blob must fall back, not kill the stage
      val img = if (r.mime == PngMime) codec.decode(r.content) else null
      if (img != null)
        MediaFeature(r.media_id, r.source, r.content.length.toLong,
          img.getWidth, img.getHeight, pixelSum(img))
      else byteStats(r)
    }
  }

  /** Ingest: documents → typed media records with a BINARY payload. */
  private[graft] def mediaRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), col("source"),
        lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** Full decode pipeline (ingest → per-partition decode → features). */
  private[graft] def mediaFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(decode)
  }

  /** PNG ingest: one REAL PNG per document (encoded with
    * `javax.imageio`), geometry/fill a closed-form function of doc_id
    * so decode output is oracle-checkable. The constant fill keeps the
    * blob small; the bytes are genuine codec output, not a fake. */
  private def encodePng(it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    val codec = new PngCodec
    it.map { r =>
      val (w, h) = (pngWidth(r.media_id), pngHeight(r.media_id))
      val (cr, cg, cb) = pngRgb(r.media_id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(cr, cg, cb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      r.copy(mime = PngMime, content = codec.encode(img))
    }
  }

  private[graft] def pngRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(encodePng)
  }

  /** The mm5 gray value — JPEG fills are GRAY so the lossy codec
    * round-trips exactly (see the codec Scaladoc). */
  private def jpegGray(id: Long): Int = (id % 256).toInt

  /** Mixed-format ingest (r15 verdict #5): even doc_ids carry the PNG
    * fixture, odd ones a REAL JPEG (explicit quality, id-derived gray
    * fill, the same closed-form geometry) — one corpus, two genuine
    * codecs, one schema. */
  private def encodeMixed(it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    val codec = new PngCodec
    it.map { r =>
      val (w, h) = (pngWidth(r.media_id), pngHeight(r.media_id))
      if (r.media_id % 2 == 0) {
        val (cr, cg, cb) = pngRgb(r.media_id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(cr, cg, cb))
        g.fillRect(0, 0, w, h)
        g.dispose()
        r.copy(mime = PngMime, content = codec.encode(img))
      } else {
        val v = jpegGray(r.media_id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(v, v, v))
        g.fillRect(0, 0, w, h)
        g.dispose()
        r.copy(mime = JpegMime, content = codec.encodeJpeg(img))
      }
    }
  }

  private[graft] def mixedRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(encodeMixed)
  }

  /** Decoded features + the mime that produced them (the mixed-corpus
    * post-decode schema). */
  case class MixedFeature(media_id: Long, mime: String, width: Int,
                          height: Int, px_sum: Long)

  /** Mime-dispatched batched decoder for the mixed corpus: each blob
    * goes through ITS format's cached reader; a genuinely undecodable
    * blob in this pipeline is a bug — fail loudly (the fixture is
    * codec output end to end). */
  private def decodeMixed(it: Iterator[MediaRecord]): Iterator[MixedFeature] = {
    val codec = new PngCodec
    it.map { r =>
      val img = codec.decodeMime(r.mime, r.content)
      if (img == null) throw new IllegalStateException(
        s"undecodable ${r.mime} blob for media ${r.media_id}")
      MixedFeature(r.media_id, r.mime, img.getWidth, img.getHeight,
        pixelSum(img))
    }
  }

  private[graft] def mixedFeatures(spark: SparkSession, sfDir: String): Dataset[MixedFeature] = {
    import spark.implicits._
    mixedRecords(spark, sfDir).mapPartitions(decodeMixed)
  }

  /** The spec hook for the JPEG exactness property: encode a uniform
    * gray (v, v, v) w×h image at `quality`, decode it, and report
    * whether EVERY pixel came back exactly (v, v, v). */
  private[graft] def jpegGrayRoundTripExact(v: Int, w: Int, h: Int,
      quality: Float = JpegQuality): Boolean = {
    val codec = new PngCodec
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val dec = codec.decodeJpeg(codec.encodeJpeg(img, quality))
    dec != null && dec.getWidth == w && dec.getHeight == h &&
      pixelSum(dec) == w.toLong * h * 3 * v
  }

  /** REAL image resize: decode → Graphics2D rescale to (tw, th) →
    * re-encode PNG. Non-PNG blobs pass through unchanged. */
  private def resizeImage(tw: Int, th: Int)(
      it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    val codec = new PngCodec
    it.map { r =>
      val img = if (r.mime == PngMime) codec.decode(r.content) else null
      if (img == null) r // non-image or undecodable blob: pass through
      else {
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        r.copy(content = codec.encode(out))
      }
    }
  }

  /** Mime-preserving resize for the mixed corpus: decode with the
    * blob's OWN codec, rescale, re-encode with the SAME codec (a
    * corpus resize must not silently transcode formats). Constant
    * fills rescale to the same constant under any interpolation, so
    * the mm6 oracle stays closed-form — PNG losslessly, JPEG by the
    * gray exactness property (uniform gray in → uniform gray out →
    * bit-exact round-trip). */
  private def resizeMixed(tw: Int, th: Int)(
      it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    val codec = new PngCodec
    it.map { r =>
      val img = codec.decodeMime(r.mime, r.content)
      if (img == null) r // non-image blob: pass through
      else {
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        r.copy(content =
          if (r.mime == JpegMime) codec.encodeJpeg(out)
          else codec.encode(out))
      }
    }
  }

  private[graft] def mixedResized(spark: SparkSession, sfDir: String): Dataset[MixedFeature] = {
    import spark.implicits._
    mixedRecords(spark, sfDir)
      .mapPartitions(resizeMixed(ResizeW, ResizeH))
      .mapPartitions(decodeMixed)
  }

  /** One sampled frame of a media blob (the video-style schema).
    * `frame_idx` is the frame's ORIGINAL index in the container, not
    * its rank among the sampled frames. */
  case class MediaFrame(media_id: Long, source: String, frame_idx: Int,
                        frame: Array[Byte])

  /** Decoded per-frame features (the post-sample schema). */
  case class FrameFeature(media_id: Long, source: String, frame_idx: Int,
                          width: Int, height: Int, px_sum: Long)

  private val FramesPerVideo = 4
  private val SampledFrames = 2 // stride sampling: original indices 0, 2
  private val ResizeW = 16
  private val ResizeH = 12
  private val VideoMime = "video/x-graft-frames"

  /** Closed-form frame geometry/fill in (doc_id, frame_idx) — the
    * contract shared by the Spark-side generator and the DuckDB
    * oracle (the video twin of pngWidth/pngHeight/pngRgb). */
  private def frameWidth(id: Long, f: Int): Int = (6 + (id + 3L * f) % 12).toInt
  private def frameHeight(id: Long, f: Int): Int = (6 + (7L * id + 5L * f) % 12).toInt
  private def frameRgb(id: Long, f: Int): (Int, Int, Int) =
    (((id + f) % 256).toInt,
     ((31L * id + 7L * f) % 256).toInt,
     ((101L * id + 13L * f) % 256).toInt)

  /** One constant-fill PNG through the real codec. */
  private def pngBytes(codec: PngCodec, w: Int, h: Int,
                       rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb._1, rgb._2, rgb._3))
    g.fillRect(0, 0, w, h)
    g.dispose()
    codec.encode(img)
  }

  /** Video ingest: one container of [[FramesPerVideo]] length-prefixed
    * REAL PNG frames per document. */
  private def encodeVideo(it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    val codec = new PngCodec
    it.map { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      (0 until FramesPerVideo).foreach { f =>
        val png = pngBytes(codec, frameWidth(r.media_id, f),
          frameHeight(r.media_id, f), frameRgb(r.media_id, f))
        out.writeInt(png.length)
        out.write(png)
      }
      r.copy(mime = VideoMime, content = bos.toByteArray)
    }
  }

  private[graft] def videoRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(encodeVideo)
  }

  /** Walk the container's length prefixes → (offset, length) per
    * frame, WITHOUT copying or decoding any frame. A container that
    * does not end exactly on a frame boundary is corrupt — fail
    * loudly rather than emit partial frames. */
  private def frameSlices(content: Array[Byte]): IndexedSeq[(Int, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(content)
    val slices = IndexedSeq.newBuilder[(Int, Int)]
    while (bb.remaining() > 0) {
      if (bb.remaining() < 4) throw new IllegalStateException(
        s"corrupt frame container: ${bb.remaining()} trailing bytes")
      val len = bb.getInt()
      if (len < 0 || len > bb.remaining()) throw new IllegalStateException(
        s"corrupt frame container: frame length $len exceeds remaining ${bb.remaining()}")
      slices += ((bb.position(), len))
      bb.position(bb.position() + len)
    }
    slices.result()
  }

  /** REAL frame sampling: stride-sample `n` of the container's frames
    * (original indices `i * F / n`), slicing out ONLY the sampled
    * frames — unsampled frames are never copied or decoded, which is
    * the property that matters when one frame is megabytes. */
  private def frameSample(n: Int)(it: Iterator[MediaRecord]): Iterator[MediaFrame] =
    it.flatMap { r =>
      val slices = frameSlices(r.content)
      val total = slices.length
      (0 until n).iterator.map(i => i * total / n).distinct.map { idx =>
        val (off, len) = slices(idx)
        MediaFrame(r.media_id, r.source, idx,
          java.util.Arrays.copyOfRange(r.content, off, off + len))
      }
    }

  /** Decode sampled frames with the same imageio codec as the image
    * path. Frames in this pipeline are genuine codec output, so an
    * undecodable frame is a pipeline bug — fail loudly. */
  private def decodeFrames(it: Iterator[MediaFrame]): Iterator[FrameFeature] = {
    val codec = new PngCodec
    it.map { fr =>
      val img = codec.decode(fr.frame)
      if (img == null) throw new IllegalStateException(
        s"undecodable frame ${fr.frame_idx} of media ${fr.media_id}")
      FrameFeature(fr.media_id, fr.source, fr.frame_idx,
        img.getWidth, img.getHeight, pixelSum(img))
    }
  }

  private[graft] def mediaFrames(spark: SparkSession, sfDir: String): Dataset[MediaFrame] = {
    import spark.implicits._
    videoRecords(spark, sfDir).mapPartitions(frameSample(SampledFrames))
  }

  /** ALL frames decoded (the per-video rollup path of mm1). */
  private[graft] def allFrameFeatures(spark: SparkSession, sfDir: String): Dataset[FrameFeature] = {
    import spark.implicits._
    videoRecords(spark, sfDir)
      .mapPartitions(frameSample(FramesPerVideo))
      .mapPartitions(decodeFrames)
  }

  private[graft] def sampledFrameFeatures(spark: SparkSession, sfDir: String): Dataset[FrameFeature] = {
    import spark.implicits._
    mediaFrames(spark, sfDir).mapPartitions(decodeFrames)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CONTENT-EXACT video rollup: build the frame container, walk its
    // length prefixes, decode EVERY frame through imageio, report
    // per-source video/frame counts + the decoded pixel-channel total.
    // The oracle restates the closed-form frame contract in SQL — a
    // sampler that miscounted frames or a decoder that fabricated
    // rasters would hash-fail.
    "mm1_media_bytes" -> ((spark, sfDir) =>
      allFrameFeatures(spark, sfDir).toDF()
        .groupBy(col("source"))
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"),
          sum(col("px_sum")).cast("long").as("px_total"))),
    // CONTENT-EXACT per-frame stats over REAL stride sampling: only
    // the sampled frames (original indices 0, 2) are sliced out and
    // decoded; output is per (media, frame) decoded dims + pixel sum.
    "mm2_frame_stats" -> ((spark, sfDir) =>
      sampledFrameFeatures(spark, sfDir).toDF()
        .select(col("media_id"), col("frame_idx"),
          col("width"), col("height"), col("px_sum"))),
    // REAL codec round-trip: encode a per-doc PNG, decode it with
    // javax.imageio, report decoded raster dims + pixel-channel sum.
    // The oracle states the closed-form expected values — a decoder
    // that fabricated dimensions would hash-fail.
    "mm3_png_decode" -> ((spark, sfDir) => {
      import spark.implicits._
      pngRecords(spark, sfDir).mapPartitions(decode).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("checksum").as("px_sum"))
    }),
    // REAL resize: decode → rescale to (ResizeW, ResizeH) → re-encode
    // → decode again. Constant-fill images rescale to the same
    // constant, so the pixel sum is closed-form for the oracle while
    // the Spark side exercises the full codec→raster→codec path.
    "mm4_png_resize" -> ((spark, sfDir) => {
      import spark.implicits._
      pngRecords(spark, sfDir)
        .mapPartitions(resizeImage(ResizeW, ResizeH))
        .mapPartitions(decode).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("checksum").as("px_sum"))
    }),
    // MIXED PNG/JPEG decode (r15 verdict #5): even ids round-trip the
    // PNG fixture, odd ids a REAL lossy JPEG whose gray fill makes
    // the decode closed-form (the exactness property the codec
    // Scaladoc derives and PipelineSpec pins) — so one hash gate
    // covers format dispatch, both codecs, and the decoded rasters.
    "mm5_mixed_decode" -> ((spark, sfDir) =>
      mixedFeatures(spark, sfDir).toDF()
        .select(col("media_id"), col("mime"), col("width"),
          col("height"), col("px_sum"))),
    // MIME-PRESERVING mixed resize: decode with the blob's own codec,
    // rescale, re-encode with the SAME codec, decode again — the full
    // lossy round-trip for JPEG rows. Constant fills rescale to the
    // same constant, so both formats stay closed-form (PNG losslessly,
    // JPEG by the gray exactness property).
    "mm6_mixed_resize" -> ((spark, sfDir) =>
      mixedResized(spark, sfDir).toDF()
        .select(col("media_id"), col("mime"), col("width"),
          col("height"), col("px_sum")))
  )

  val oracle: Map[String, String] = Map(
    // the frame generator contract (frameWidth/frameHeight/frameRgb)
    // in SQL, over ALL frame indices — the Spark side must reproduce
    // it via real container walk + PNG decode
    "mm1_media_bytes" ->
      s"""SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_media,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum((6 + (doc_id + 3*f.i) % 12) * (6 + (7*doc_id + 5*f.i) % 12) *
         |    ((doc_id + f.i) % 256 + (31*doc_id + 7*f.i) % 256 +
         |     (101*doc_id + 13*f.i) % 256)) AS BIGINT) AS px_total
         |FROM documents
         |CROSS JOIN (VALUES (0),(1),(2),(3)) AS f(i)
         |GROUP BY source""".stripMargin,
    // same contract restricted to the sampled indices (stride
    // sampling of 2 from 4: original indices 0 and 2)
    "mm2_frame_stats" ->
      s"""SELECT doc_id AS media_id, CAST(f.i AS INT) AS frame_idx,
         |  CAST(6 + (doc_id + 3*f.i) % 12 AS INT) AS width,
         |  CAST(6 + (7*doc_id + 5*f.i) % 12 AS INT) AS height,
         |  CAST((6 + (doc_id + 3*f.i) % 12) * (6 + (7*doc_id + 5*f.i) % 12) *
         |    ((doc_id + f.i) % 256 + (31*doc_id + 7*f.i) % 256 +
         |     (101*doc_id + 13*f.i) % 256) AS BIGINT) AS px_sum
         |FROM documents
         |CROSS JOIN (VALUES (0),(2)) AS f(i)""".stripMargin,
    // the generator contract (pngWidth/pngHeight/pngRgb) in SQL: the
    // Spark side must reproduce these via a REAL PNG encode→decode
    "mm3_png_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 25 AS INT) AS width,
        |  CAST(8 + (doc_id * 7) % 25 AS INT) AS height,
        |  CAST((8 + doc_id % 25) * (8 + (doc_id * 7) % 25) *
        |    (doc_id % 256 + (doc_id * 31) % 256 + (doc_id * 101) % 256)
        |    AS BIGINT) AS px_sum
        |FROM documents""".stripMargin,
    "mm4_png_resize" ->
      s"""SELECT doc_id AS media_id,
         |  CAST($ResizeW AS INT) AS width,
         |  CAST($ResizeH AS INT) AS height,
         |  CAST($ResizeW * $ResizeH *
         |    (doc_id % 256 + (doc_id * 31) % 256 + (doc_id * 101) % 256)
         |    AS BIGINT) AS px_sum
         |FROM documents""".stripMargin,
    // per-format closed forms: PNG rows state the colored-fill
    // contract; JPEG rows state the gray fill (3·v per pixel), valid
    // because uniform gray survives the lossy codec exactly
    "mm5_mixed_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/png'
        |       ELSE 'image/jpeg' END AS mime,
        |  CAST(8 + doc_id % 25 AS INT) AS width,
        |  CAST(8 + (doc_id * 7) % 25 AS INT) AS height,
        |  CAST((8 + doc_id % 25) * (8 + (doc_id * 7) % 25) *
        |    (CASE WHEN doc_id % 2 = 0
        |       THEN doc_id % 256 + (doc_id * 31) % 256 + (doc_id * 101) % 256
        |       ELSE 3 * (doc_id % 256) END)
        |    AS BIGINT) AS px_sum
        |FROM documents""".stripMargin,
    // post-resize, both formats are the target raster with the source
    // fill: constant fills survive rescale AND (for gray) the second
    // lossy JPEG encode→decode
    "mm6_mixed_resize" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'image/png'
         |       ELSE 'image/jpeg' END AS mime,
         |  CAST($ResizeW AS INT) AS width,
         |  CAST($ResizeH AS INT) AS height,
         |  CAST($ResizeW * $ResizeH *
         |    (CASE WHEN doc_id % 2 = 0
         |       THEN doc_id % 256 + (doc_id * 31) % 256 + (doc_id * 101) % 256
         |       ELSE 3 * (doc_id % 256) END)
         |    AS BIGINT) AS px_sum
         |FROM documents""".stripMargin
  )
}
