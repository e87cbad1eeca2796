package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Clustering

/** Streaming semantic dedup — the streaming twin of sdd2's
  * incremental probe (itself the daily-ingest shape of sdd1's batch
  * SemDeDup): an embedding stream is dup-checked against a FROZEN
  * k-means index (centroids + assigned members) as it arrives.
  *
  * Shape: `foreachBatch`, the IngestDedupStream pattern. The
  * per-trigger work is EXACTLY [[Clustering.probeBatchSemantic]] —
  * shared with the sdd2 gate so stream and batch can never diverge on
  * semantics: assign each arriving vector to its nearest frozen
  * centroid (map-side, literal-inlined centroids), then the τ=0.9
  * exact-decimal cosine test against persisted same-cluster members
  * plus smaller-id batch mates.
  *
  * State story at 100 TB/day: the only state is the index (centroid
  * metadata + the members table), which lives OUTSIDE the streaming
  * state store — a parquet/bucketed artifact appended per batch
  * out-of-band, the dd7 discipline; the caller owns its lifetime and
  * its refit cadence (clu1's adaptive k re-derives only when the
  * corpus count crosses a k boundary — dd10's geometric re-index
  * argument). Each trigger costs a batch-sized probe: the members
  * side is an equi-join on cluster with adaptive-k-bounded
  * membership, so join volume is ~|batch|·625 — never a corpus pass,
  * never a refit. Per-trigger persisted blocks are freed explicitly
  * after the sink consumes the verdicts (a GC-driven ContextCleaner
  * may not run for hours in a long-lived service).
  *
  * Mate visibility across triggers mirrors the batch semantics ONLY
  * through the out-of-band member append: rows in earlier triggers
  * are invisible to later ones until the caller appends them. The
  * StreamingSpec fixture (planted exact copies) is insensitive to
  * that split — every copy's verdict comes from its persisted source
  * (cosine 1 ≥ τ), which is the property the spec pins.
  */
object SemDedupStream {

  /** Wire a parquet embedding stream (vec_id, embedding) through the
    * frozen-index probe, handing each trigger's (vec_id, cluster,
    * is_dup) verdicts to `sink`. Default trigger drains what exists
    * and stops (backfill / testing); a long-running ingest service
    * passes e.g. `Trigger.ProcessingTime("1 minute")`. */
  def run(spark: SparkSession, vecsDir: String,
          schema: org.apache.spark.sql.types.StructType,
          centroids: Seq[(Long, Array[Long])], members: DataFrame,
          sink: DataFrame => Unit,
          maxFilesPerTrigger: Int = 1,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(vecsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (verdicts, persisted) =
          Clustering.probeBatchSemanticTracked(batch, centroids, members)
        try sink(verdicts)
        finally persisted.unpersist(blocking = false)
      }
      .trigger(trigger)
      .start()
}
