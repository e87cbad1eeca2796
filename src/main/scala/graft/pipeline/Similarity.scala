package graft.pipeline

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Similarity search over the `embeddings` table (64-dim FLOAT
  * vectors). Two paths with the SAME output contract:
  *
  *  - `sim1_cosine_topk`: exact brute-force cosine top-k for a fixed
  *    probe — the correctness baseline. All math in double precision
  *    via codegen'd higher-order functions (`zip_with`/`aggregate`),
  *    no UDF, probe broadcast; one full scan, map-side top-k via
  *    sort+limit (Spark plans TakeOrderedAndProject — partial top-k
  *    per partition, k rows to the driver, never a global sort).
  *  - `sim2_ann_lsh`: the scale path — random-hyperplane bucketing
  *    (spark.ml BucketedRandomProjectionLSH on L2-normalized vectors,
  *    where Euclidean order ≡ cosine order) prunes candidates, then
  *    exact cosine re-scoring of the candidate set only. Shares sim1's
  *    DuckDB oracle: at test scale LSH recall must be (and is) 1, so
  *    approximate-equals-exact IS the gate.
  *
  * The cosine kernel mirrors what the reference does driver-side with
  * torch matmuls in `/root/reference/coreset.py:48-89` (U·Lᵀ cosine
  * sim matrix), re-expressed as a distributed scan.
  *
  * Scale (100 TB): brute force is O(N) per probe with a broadcast
  * probe — fine for one probe, wrong for probe-batches; the LSH path
  * buckets both sides so probe batches become an equi-join on
  * (table, bucket). Neither path ever materializes the N×N product.
  */
object Similarity {

  private val ProbeId = 0L
  private val TopK = 10

  /** embeddings with double-cast array + precomputed L2 norm. */
  private def withNorm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm",
        sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))

  /** Exact cosine of every row vs the probe row; (vec_id, cos_sim
    * DOUBLE un-rounded). */
  private def cosineToProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val e = withNorm(spark, sfDir)
    val probe = e.filter(col("vec_id") === ProbeId)
      .select(col("v").as("pv"), col("nrm").as("pn"))
    e.filter(col("vec_id") =!= ProbeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        (expr("aggregate(zip_with(v, pv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
          / (col("nrm") * col("pn"))).as("cos_sim"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim1_cosine_topk" -> ((spark, sfDir) =>
      cosineToProbe(spark, sfDir)
        .orderBy(col("cos_sim").desc)
        .limit(TopK)
        .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))),
    "sim2_ann_lsh" -> ((spark, sfDir) => {
      val e = withNorm(spark, sfDir)
        .select(col("vec_id"),
          array_to_vector(expr("transform(v, x -> x / nrm)")).as("features"))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(15).setBucketLength(1.0).setSeed(42)
      val model = lsh.fit(e)
      val probeVec = e.filter(col("vec_id") === ProbeId)
        .select(col("features")).head().getAs[org.apache.spark.ml.linalg.Vector](0)
      val candidateIds = model
        .approxNearestNeighbors(e.filter(col("vec_id") =!= ProbeId), probeVec, TopK)
        .select(col("vec_id"))
      // exact re-score of the candidate set only (same kernel as sim1)
      cosineToProbe(spark, sfDir)
        .join(broadcast(candidateIds), "vec_id")
        .orderBy(col("cos_sim").desc)
        .limit(TopK)
        .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))
    })
  )

  private val topkOracleSql =
    s"""SELECT e.vec_id,
       |  round(list_dot_product(e.embedding, p.embedding) /
       |    (sqrt(list_dot_product(e.embedding, e.embedding)) *
       |     sqrt(list_dot_product(p.embedding, p.embedding))), 4) AS cos_sim
       |FROM embeddings e,
       |  (SELECT embedding FROM embeddings WHERE vec_id = $ProbeId) p
       |WHERE e.vec_id <> $ProbeId
       |ORDER BY list_dot_product(e.embedding, p.embedding) /
       |    (sqrt(list_dot_product(e.embedding, e.embedding)) *
       |     sqrt(list_dot_product(p.embedding, p.embedding))) DESC
       |LIMIT $TopK""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim1_cosine_topk" -> topkOracleSql,
    // approximate path must equal the exact path at test scale
    "sim2_ann_lsh" -> topkOracleSql
  )
}
