package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing: media as opaque BINARY columns with
  * typed metadata, batched per-partition decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`) — but everything
  * around it is the real 100 TB shape:
  *  - media rides in a `BINARY` column inside the row (at production
  *    scale you'd point at object-store keys instead once blobs exceed
  *    a few MB, same schema otherwise);
  *  - the decoder runs via `mapPartitions` on a typed Dataset — one
  *    iterator per partition, so a real implementation amortizes codec
  *    init per partition exactly like a Pandas-UDF batch would;
  *  - downstream of the stub it's columnar aggregates again.
  *
  * Since the testdata ships no binary table, `documents.text`'s UTF-8
  * bytes stand in for the blob; the byte-count aggregate is oracle-
  * checked against DuckDB's `octet_length(encode(text))`.
  */
object Multimodal {

  /** A media blob + its typed metadata (the ingest-side schema). */
  case class MediaRecord(media_id: Long, source: String,
                         mime: String, content: Array[Byte])

  /** Extracted per-media features (the post-decode schema). */
  case class MediaFeature(media_id: Long, source: String, n_bytes: Long,
                          width: Int, height: Int, checksum: Long)

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * fake: "dimensions" and checksum derived from the bytes. A real
    * build swaps only this function's body (per-partition batched,
    * codec handle initialized once per iterator).
    */
  private def decodeStub(it: Iterator[MediaRecord]): Iterator[MediaFeature] = {
    // (real codec/session init would happen here, once per partition)
    it.map { r =>
      var cs = 1125899906842597L
      var i = 0
      while (i < r.content.length) { cs = cs * 31 + (r.content(i) & 0xff); i += 1 }
      MediaFeature(r.media_id, r.source, r.content.length.toLong,
        width = 1 + math.floorMod(cs, 640L).toInt,
        height = 1 + math.floorMod(cs >> 16, 480L).toInt,
        checksum = cs)
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
    mediaRecords(spark, sfDir).mapPartitions(decodeStub)
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
          sum(octet_length(col("frame"))).cast("long").as("frame_bytes")))
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_bytes" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source""".stripMargin,
    "mm2_frame_stats" ->
      s"""SELECT source, CAST(count(*) * $FramesPerMedia AS BIGINT) AS n_frames,
         |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS frame_bytes
         |FROM documents GROUP BY source""".stripMargin
  )
}
