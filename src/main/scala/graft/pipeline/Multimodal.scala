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
  * The VIDEO path (frame sampling) remains a declared stub — the JDK
  * ships no video codec — but its byte-conservation contract is
  * oracle-checked. mm1/mm2 run over `documents.text`'s UTF-8 bytes
  * standing in for opaque blobs; the byte-count aggregates are
  * oracle-checked against DuckDB's `octet_length(encode(text))`.
  */
object Multimodal {

  /** A media blob + its typed metadata (the ingest-side schema). */
  case class MediaRecord(media_id: Long, source: String,
                         mime: String, content: Array[Byte])

  /** Extracted per-media features (the post-decode schema). */
  case class MediaFeature(media_id: Long, source: String, n_bytes: Long,
                          width: Int, height: Int, checksum: Long)

  private val PngMime = "image/png"

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
    // per-partition codec state: one JVM-wide flag flip (default
    // disk-backed stream caching costs a temp file per call) — the
    // codec-amortization point of running decode via mapPartitions
    javax.imageio.ImageIO.setUseCache(false)
    def byteStats(r: MediaRecord): MediaFeature = {
      var cs = 1125899906842597L
      var i = 0
      while (i < r.content.length) { cs = cs * 31 + (r.content(i) & 0xff); i += 1 }
      MediaFeature(r.media_id, r.source, r.content.length.toLong,
        width = 0, height = 0, checksum = cs)
    }
    it.map { r =>
      // ImageIO.read returns NULL (it does not throw) on undecodable
      // bytes — a corrupt blob must fall back, not NPE the stage
      val img = if (r.mime == PngMime)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      else null
      if (img != null) {
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        MediaFeature(r.media_id, r.source, r.content.length.toLong,
          img.getWidth, img.getHeight, sum)
      } else byteStats(r)
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
    javax.imageio.ImageIO.setUseCache(false) // memory-backed streams
    it.map { r =>
      val (w, h) = (pngWidth(r.media_id), pngHeight(r.media_id))
      val (cr, cg, cb) = pngRgb(r.media_id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(cr, cg, cb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      r.copy(mime = PngMime, content = bos.toByteArray)
    }
  }

  private[graft] def pngRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(encodePng)
  }

  /** REAL image resize: decode → Graphics2D rescale to (tw, th) →
    * re-encode PNG. Non-PNG blobs pass through unchanged. */
  private def resizeImage(tw: Int, th: Int)(
      it: Iterator[MediaRecord]): Iterator[MediaRecord] = {
    javax.imageio.ImageIO.setUseCache(false)
    it.map { r =>
      val img = if (r.mime == PngMime)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      else null
      if (img == null) r // non-image or undecodable blob: pass through
      else {
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        r.copy(content = bos.toByteArray)
      }
    }
  }

  /** One sampled frame of a media blob (the video-style schema). */
  case class MediaFrame(media_id: Long, source: String, frame_idx: Int,
                        frame: Array[Byte])

  /** STUB frame sampler: splits the blob into `n` contiguous chunks
    * (a real implementation decodes and samples actual frames). The
    * chunks partition the payload exactly, so byte totals are
    * conserved — which is what the oracle checks. */
  private def frameSampleStub(n: Int)(it: Iterator[MediaRecord]): Iterator[MediaFrame] =
    it.flatMap { r =>
      val len = r.content.length
      (0 until n).iterator.map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        MediaFrame(r.media_id, r.source, i, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }

  /** STUB resize: deterministic stride subsampling of the payload to
    * at most `target` bytes (a real implementation rescales pixels).
    */
  private def resizeStub(target: Int)(it: Iterator[MediaRecord]): Iterator[MediaRecord] =
    it.map { r =>
      if (r.content.length <= target) r
      else {
        val stride = r.content.length.toDouble / target
        val out = new Array[Byte](target)
        var i = 0
        while (i < target) { out(i) = r.content((i * stride).toInt); i += 1 }
        r.copy(content = out)
      }
    }

  private val FramesPerMedia = 4
  private val ResizeTarget = 64
  private val ResizeW = 16
  private val ResizeH = 12

  private[graft] def mediaFrames(spark: SparkSession, sfDir: String): Dataset[MediaFrame] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(frameSampleStub(FramesPerMedia))
  }

  private[graft] def resizedMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(resizeStub(ResizeTarget))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // byte accounting through the BINARY + mapPartitions path; the
    // aggregate is what the oracle can check (dims/checksum are
    // stub-defined and covered by MultimodalSpec instead)
    "mm1_media_bytes" -> ((spark, sfDir) =>
      mediaFeatures(spark, sfDir).toDF()
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).cast("long").as("total_bytes"))),
    // frame sampling conserves bytes: n frames per media, chunk sizes
    // summing to the original payload — the oracle-checkable property
    // of the (stubbed) video path
    "mm2_frame_stats" -> ((spark, sfDir) =>
      mediaFrames(spark, sfDir).toDF()
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).cast("long").as("frame_bytes"))),
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
    })
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_bytes" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "mm2_frame_stats" ->
      s"""SELECT source, CAST(count(*) * $FramesPerMedia AS BIGINT) AS n_frames,
         |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS frame_bytes
         |FROM documents GROUP BY source""".stripMargin,
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
         |FROM documents""".stripMargin
  )
}
