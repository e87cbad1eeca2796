package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Frees the block-holding RDDs behind an eagerly localCheckpoint'd
  * frame.
  *
  * `Dataset.unpersist()` is a CacheManager call and localCheckpoint
  * persists at the RDD level, so it is a NO-OP on a checkpointed frame
  * — the blocks linger until the GC-driven ContextCleaner notices the
  * dead weak refs, which in a long-lived session means they accumulate
  * across every round of a data-dependent loop. The fix is to
  * unpersist the RDDs themselves: for an eagerly localCheckpointed
  * frame the physical plan IS its own checkpoint RDD (lineage is
  * truncated), so walking `queryExecution.toRdd`'s dependency graph
  * for persisted nodes reaches exactly this frame's blocks and never a
  * persist belonging to another dataset — unlike diffing the
  * context-global persistent-RDD set, which would drop caches a
  * concurrent query created in the meantime.
  */
object CheckpointBlocks {

  /** The persisted RDDs reachable from `df`'s physical plan. */
  def persistedRdds(df: DataFrame): Seq[RDD[_]] = {
    val seen = scala.collection.mutable.Set[Int]()
    def walk(r: RDD[_]): Seq[RDD[_]] =
      if (!seen.add(r.id)) Nil
      else {
        val here =
          if (r.getStorageLevel != StorageLevel.NONE) Seq(r) else Nil
        here ++ r.dependencies.flatMap(d => walk(d.rdd))
      }
    walk(df.queryExecution.toRdd)
  }

  /** Unpersist every RDD holding blocks for `df` (non-blocking by
    * default: the caller has already materialized its successor). */
  def free(df: DataFrame, blocking: Boolean = false): Unit =
    persistedRdds(df).foreach(_.unpersist(blocking))
}
