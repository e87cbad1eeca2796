package graft.pipeline

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

import graft.engine.Tables
import graft.functions.{CosineSimilarity, DotProduct, HyperplaneBands, SrpBandSigs, TopKPairs}

/** Similarity search + embedding near-dup over the `embeddings`
  * table (64-dim FLOAT vectors). Exact paths are the oracle-checked
  * ground truth; bucketed paths are the 100 TB scale story and must
  * reproduce the exact results at test scale (they share the exact
  * oracles — approximate-equals-exact IS the gate):
  *
  *  - `sim1_cosine_topk`: exact brute-force cosine top-k for a fixed
  *    probe. One scan, broadcast probe, TakeOrderedAndProject (per-
  *    partition top-k, k rows to the driver, no global sort).
  *  - `sim2_ann_lsh`: random-hyperplane LSH
  *    (BucketedRandomProjectionLSH on L2-normalized vectors, where
  *    Euclidean order ≡ cosine order) prunes candidates → exact
  *    re-score.
  *  - `sim3_ann_ivf`: IVF — a k-means coarse quantizer partitions the
  *    corpus; the probe searches only the `nprobe` nearest cells →
  *    exact re-score. The classic disk-friendly ANN layout: at scale
  *    the cell id is the partition/bucket key and a probe touches
  *    nprobe/k of the data.
  *  - `dd5_embed_neardup`: embedding-cosine near-duplicate pairs
  *    (exact all-pairs at test scale — the oracle-able ground truth).
  *  - `dd5_blocked_neardup`: the production-shaped path — banded
  *    random-hyperplane signatures ([[graft.functions.HyperplaneBands]])
  *    → equi-join on (band, signature) → exact cosine re-score of
  *    candidates only. Shares dd5's oracle: blocked-equals-exact IS
  *    the gate (the dd3/dd2 pattern). No cross product anywhere in
  *    the plan; the band join shuffles on bounded keys at 100 TB.
  *
  * The cosine kernel is the native codegen'd
  * [[graft.functions.CosineSimilarity]] expression — one fused loop
  * per row instead of three interpreted higher-order functions; it
  * accumulates in the same order, so results are bit-identical to the
  * composable form and the DuckDB oracles are unchanged.
  */
object Similarity {

  private val ProbeId = 0L
  private val TopK = 10
  private val NearDupThreshold = 0.4
  private val IvfSeed = 7
  private val IvfIters = 5

  /** ADAPTIVE IVF plan (r14 verdict #4 — the dd10/sim7 corpus-count
    * pattern applied to the cell grid): cells ~ √n with a floor, so
    * per-cell membership ALSO grows as √n and neither the quantizer
    * fit (n·cells) nor a probe (nprobe·n/cells candidates) goes
    * quadratic; probes are a FIXED FRACTION of the cells with a
    * floor. The r14 sweep measured the fixed 16-cell grid falling to
    * recall@10 = 0.80 at 20k vectors (12/16 probed); finer cells at
    * the same 3/4 probe fraction ranks candidate cones more sharply
    * on weakly-clustered random 64-d data — the r15 sweep contract
    * re-measures recall ≥ 0.9 at sf1. Both functions are re-derived
    * from count(*) by the DuckDB oracle, and the chosen (cells,
    * nprobe) ride in the output columns so the gate pins the DECISION
    * as well as the result. */
  private val IvfMinCells = 16
  private val IvfMinProbes = 12 // random 64-d data clusters weakly; recall@top-10 needs wide probing
  private val IvfProbeFrac = 0.75
  private[graft] def ivfCellsFor(n: Long): Int =
    math.max(IvfMinCells, math.ceil(math.sqrt(n.toDouble)).toInt)
  private[graft] def ivfProbesFor(cells: Int): Int =
    math.min(cells, math.max(IvfMinProbes,
      math.ceil(cells * IvfProbeFrac).toInt))
  private val KnnK = 5
  /** emb2's target dimensionality (64-d input → 8-d JL sign-sketch). */
  private val RpDims = 8

  /** emb2's sign matrix as an `array(array(...))` SQL literal,
    * outer-indexed by k (1-based via element_at), inner by j. Sign =
    * parity of the first 4 hex digits of md5("rp<j>_<k>") — the
    * EXACT formula the DuckDB oracle re-derives in SQL, evaluated
    * here once on the driver instead of once per (row, j, k). */
  private def rpSignsSql(dim: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, k: Int): String = {
      val hex = md.digest(s"rp${j}_$k".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex, 16) % 2 == 0) "1.0D" else "-1.0D"
    }
    (0 until RpDims).map(k =>
      (0 until dim).map(j => sign(j, k)).mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
  }

  // --- clustered fixture (sim5): the synthetic embeddings are
  //     structureless (max pair cos ~0.5 over ~0 background), the one
  //     regime where NO sublinear ANN can beat exact search — so the
  //     blocked kNN path gets its oracle on a corpus with planted
  //     cluster structure, derived DETERMINISTICALLY from the same
  //     table with arithmetic both engines express identically:
  //     cluster(c) = vec_id mod Clusters, centroid = the vector of row
  //     vec_id = c, member = centroid + ClusterNoise * own vector.
  //     Measured on this fixture: min top-5 cos ~0.978 vs max
  //     cross-cluster cos ~0.40 — the neighbor-signal regime the
  //     knnJoinBlocked scaladoc names.
  private val Clusters = 20
  private val ClusterNoise = 0.15
  // (16, 64) bands: at the fixture's weakest true neighbor
  //  (cos 0.967, p_bit = 1 - acos/pi = 0.918) a band collides with
  //  p = 0.918^16 = 0.25, so P(miss all 64) ~ 7e-9 per neighbor —
  //  negligible across the 10k gated neighbor slots; background pairs
  //  (cos ~ 0, p_band = 0.5^16) land ~1e-3 of random pairs in the
  //  candidate set, so the join stays ~cluster-sized.
  private val KnnBits = 16
  private val KnnBands = 64
  // sim6's dense-bucket partner cap. Dormant wherever buckets stay
  // under 64 members — structurally guaranteed at gate scale (sf0.01:
  // clusters have ≤25 members and a bucket is a same-signature SUBSET
  // of one cluster plus ~0 background collisions at 2^-16 per row), so
  // sim6 shares sim5's exact oracle there; at bench scale and beyond
  // the cap engages and bounds candidates at N·bands·cap (linear),
  // where uncapped growth is Σ bucketSize² (quadratic — measured 29×
  // for 10× data in the r8 sf1 run).
  private val KnnBucketCap = 64

  // --- sim7: the ENGAGED-cap recurring gate (r9 verdict residual #1).
  // sim6's cap is provably dormant at gate scale, so its oracle never
  // exercises the one behavior a 100 TB deployment actually runs: a
  // cap that DROPS partners. sim7 runs the SAME knnFromSignatures
  // core as sim6 with (a) md5-derived ±1 SRP hyperplanes and (b) an
  // md5-derived cap tie-hash — both re-derivable in DuckDB SQL (the
  // emb2 sign-matrix trick) — and a cap chosen BELOW the fixture's
  // bucket sizes, so the cap engages at sf0.01 and the oracle
  // hash-matches the ENGAGED result every round. Parameters: on the
  // clustered fixture a member matches its centroid's 12-bit band
  // signature w.p. ≈0.918^12 ≈ 0.36, so a typical (band, sig) bucket
  // holds ~9 of a 25-member cluster — cap 4 genuinely drops partners
  // (spec-asserted), while 16 bands with per-band-varying kept
  // subsets keep recall@5 high (spec-gated ≥ 0.85).
  private val EngagedBands = 16
  private val EngagedBits = 12
  private val EngagedCap = 4

  /** sim7's cap tie-hash: the first 15 hex digits (60 bits — positive
    * in a signed int64, no overflow edge) of md5("cap<vec_id>_<band>")
    * — DuckDB re-derives the identical value via its 0x-prefix cast,
    * so the ENGAGED cap keeps the same partners in both engines. */
  private val engagedCapOrderSql: String =
    "cast(conv(substr(md5(concat('cap', cast(vec_id as string), '_', " +
      "cast(band as string))), 1, 15), 16, 10) as bigint)"

  // --- dd10: ADAPTIVE banding (r9 verdict weak item: at any FIXED
  // (bits, bands), bucket occupancy grows linearly with the corpus, so
  // blocked near-dup candidates grow with Σ bucketSize² — quadratic;
  // measured super-linear at sf1). The classic LSH auto-tune derives
  // the plan from the corpus SIZE instead:
  //   bits  = smallest b with 2^b · AdaptiveTargetBucket ≥ n — keeps
  //           the EXPECTED random-collision bucket at ~TargetBucket
  //           members as n grows. Integer-exact (a shift compare), so
  //           both engines derive the identical b with no float log.
  //   bands = ceil(ln(1−recall) / ln(1−p^bits)), p = 1−acos(tau)/π
  //           (the random-hyperplane collision bound) — keeps recall
  //           of a true pair at tau ≥ AdaptiveRecall as bits rise.
  // Candidate volume is then ~ n·bands·TargetBucket with
  // bands ~ (1/p)^bits ~ n^{log2(1/p)}, i.e. total work ~ n^{1+ρ},
  // ρ = ln(p₁)/ln(p₂) ≈ 0.22 at tau 0.9 — the standard sub-quadratic
  // LSH curve, vs n² at any fixed plan. The bits→bands table is
  // evaluated ONCE here on the driver and inlined into the DuckDB
  // oracle as CASE literals, so no cross-engine float (acos/ln/pow)
  // difference can flip a ceil; the only data-driven input, n, feeds
  // an integer derivation both engines share. At 100 TB the count is
  // a metastore stats lookup, not a scan.
  private[graft] val AdaptiveTau = 0.9
  private[graft] val AdaptiveTargetBucket = 16
  private[graft] val AdaptiveRecall = 0.999
  private[graft] val AdaptiveBitsMin = 4
  private[graft] val AdaptiveBitsMax = 24

  /** bands for a given bits at [[AdaptiveTau]]/[[AdaptiveRecall]] —
    * delegates to the ONE derivation ([[HyperplaneBands.bandsFor]];
    * r10 verdict #6 unification). */
  private[graft] def adaptiveBands(bits: Int): Int =
    HyperplaneBands.bandsFor(AdaptiveTau, 1.0 - AdaptiveRecall, bits)

  /** (bits, bands) for a corpus of n rows — the SCALE mode of
    * [[HyperplaneBands.bandPlan]] at this gate's constants. bits
    * saturates at [[AdaptiveBitsMax]] (2^24 buckets/band ≈ 268M-row
    * corpora per target-16 bucket; beyond that bands alone carry
    * recall). */
  private[graft] def adaptiveBandPlan(n: Long): (Int, Int) =
    HyperplaneBands.bandPlan(AdaptiveTau, 1.0 - AdaptiveRecall, Some(n),
      targetBucket = AdaptiveTargetBucket,
      bitsMin = AdaptiveBitsMin, bitsMax = AdaptiveBitsMax)

  /** md5-derived ±1 SRP hyperplanes (sim7, dd10) as a tiny
    * driver-built FLAT (k, band, j, s) frame — one row per (band, bit,
    * component), bands×bits×dim rows, broadcast against the exploded
    * corpus. Built driver-side like emb2's rpSignsSql (same
    * first-4-hex-digits parity formula the DuckDB oracle re-derives);
    * a frame, not a literal: thousands of inline signs would bloat one
    * codegen'd array literal toward the 64KB method limit. */
  private def srpHyperplanesFlat(spark: SparkSession, dim: Int,
                                 bands: Int, bits: Int): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(c: Int, j: Int, k: Int): Double = {
      val hex = md.digest(s"hp${c}_${j}_$k".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex, 16) % 2 == 0) 1.0 else -1.0
    }
    import spark.implicits._
    (for { c <- 0 until bands; j <- 0 until bits; k <- 0 until dim }
      yield (k, c, j, sign(c, j, k)))
      .toDF("k", "band", "j", "s")
  }

  /** (vec_id, band, sig) SRP signatures for sim7/dd10: the dot of each
    * corpus vector with each hyperplane, accumulated as exact LONG
    * micro-units — each term is `floor(x·s·1e9 + 0.5)` (the explicit
    * floor-form rounding emb1 uses because engines' round() HALF
    * semantics differ), so the per-term value is a deterministic IEEE
    * double → bigint in BOTH engines and the SUM is integer-exact and
    * order-free; bit j of band c is set iff dot >= 0. Runs as the
    * fused [[graft.functions.SrpBandSigs]] kernel — one loop per row,
    * no intermediate rows. Three slower formulations preceded it (all
    * bench-measured at sf0.1): an interpreted zip_with/aggregate
    * DECIMAL fold (16.5 s — HOF lambdas execute interpreted), an
    * explode/join/agg shape with DECIMAL(18,9) terms (29 s — one
    * BigDecimal allocation per 24.6M terms), and the same shape with
    * LONG terms (~1 s, r10–r11) — which still fanned every row into
    * dim × bands · bits joined rows (131M at sf0.1) and paid hash-agg
    * bookkeeping per TERM. [[srpSignaturesViaJoin]] keeps that last
    * formulation as the spec cross-check of the kernel. */
  private[graft] def srpSignatures(spark: SparkSession, e: DataFrame,
      bands: Int = EngagedBands, bits: Int = EngagedBits): DataFrame =
    spread(e).select(col("vec_id"),
      posexplode(expr(s"graft_srp_bands(v, $bands, $bits)"))
        .as(Seq("band", "sig")))

  /** The r10 explode → broadcast-join → two-agg formulation of
    * [[srpSignatures]], kept ONLY as the independent cross-check that
    * the fused kernel computes identical signatures (PipelineSpec). */
  private[graft] def srpSignaturesViaJoin(spark: SparkSession, e: DataFrame,
      bands: Int = EngagedBands, bits: Int = EngagedBits): DataFrame = {
    val dim = e.select(expr("size(v)")).head().getInt(0)
    spread(e).select(col("vec_id"), posexplode(col("v")).as(Seq("k", "x")))
      .join(broadcast(srpHyperplanesFlat(spark, dim, bands, bits)), "k")
      .groupBy(col("vec_id"), col("band"), col("j"))
      .agg(sum(expr("cast(floor(x * s * 1e9 + 0.5) as bigint)")).as("dot"))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(expr("if(dot >= 0, shiftleft(1L, j), 0L)")).as("sig"))
  }

  // --- planted near-dup (dd5_blocked_tau09): the corpus has no pair
  //     above cos 0.51, so at tau=0.9 the gate was empty-vs-empty
  //     (precision-only). Union an exact copy of row PlantedSrc under
  //     a fresh id — expressible in both engines — so the tau=0.9
  //     entry must FIND the planted pair (recall) and nothing else
  //     (precision).
  private val PlantedSrc = 0L
  private val PlantedId = 1000000L

  /** Hash-spread a narrow corpus frame across the session's shuffle
    * parallelism before a per-row- or per-pair-heavy kernel. The test
    * fixtures arrive as ONE parquet split (a single row group, which
    * `maxPartitionBytes` cannot subdivide), so without this the
    * signature/scoring kernels — O(rows × bands·bits·dim) or O(N²/P)
    * work over O(rows) input — run on one core: measured 2.07 s → 0.32 s
    * for sim4's scoring stage at sf0.1 on local[32]. At 100 TB the
    * exchange is O(input rows) of raw vectors, negligible next to the
    * kernel it feeds (and a wide input is already parallel — the
    * exchange then just rebalances). Hash on the row id, not
    * round-robin: RoundRobinPartitioning inserts a whole-row local
    * sort for retry determinism that the binary vector column would
    * pay for), and with an EXPLICIT partition count: a bare
    * `repartition(col)` is fair game for AQE's small-shuffle
    * coalescing — a 2000-row corpus is ~1 MB, so AQE folds it straight
    * back to one partition and the kernel is single-core again. The
    * explicit count pins the parallelism; the unit of work downstream
    * is COMPUTE per row, not the bytes AQE can see. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      col("vec_id"))

  /** embeddings as double arrays: (vec_id, v). */
  private[graft] def vecs(spark: SparkSession, sfDir: String): DataFrame = {
    CosineSimilarity.register(spark)
    DotProduct.register(spark)
    HyperplaneBands.register(spark)
    TopKPairs.register(spark)
    SrpBandSigs.register(spark)
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
  }

  /** Fitted IVF coarse quantizers, keyed by (session, corpus). A real
    * IVF index is built ONCE and amortized over every probe; re-fitting
    * k-means inside the query path made sim3 the slowest bench entry
    * (r02 verdict). The cache is the Spark-local stand-in for the
    * persisted index header a 100 TB deployment would store next to
    * the data. Bounded LRU so stopped sessions don't pin their model
    * graphs forever; a corpus REWRITTEN under the same path within one
    * session would serve the stale index — out of scope here (real
    * deployments version the index with the data). */
  private val MaxIndexCache = 32

  private def lruCache[V](): java.util.Map[(SparkSession, String), V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(SparkSession, String), V](8, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(SparkSession, String), V]): Boolean =
          size() > MaxIndexCache
      })

  /** Index load/save failures degrade to a refit, which is correct
    * but expensive — surface each one so a persistently broken index
    * dir is visible instead of a silent per-session refit. Fatal
    * errors (OOM, interrupts) propagate: only NonFatal is caught at
    * the call sites. */
  private def warnIndexIo(what: String, dir: String, e: Throwable): Unit =
    System.err.println(
      s"[graft] $what failed under $dir (falling back to refit): $e")

  private val ivfCache = lruCache[KMeansModel]()

  /** On-disk home of the persisted coarse quantizer — the "index
    * header stored next to the data" the class doc promises. Keyed by
    * the corpus file's identity (name + mtime + size) so a regenerated
    * corpus gets a fresh index; lives under the JVM temp root (never
    * inside the read-only testdata). */
  private def ivfIndexPath(sfDir: String, cells: Int): String = {
    val f = new java.io.File(s"$sfDir/embeddings.parquet")
    // key includes the quantizer hyperparameters: an index built under
    // different (k, seed, iters) must never be served to code that
    // changed them — that would be a silent recall loss. `cells` is
    // corpus-count-derived, so a corpus rewrite that changes n also
    // rotates the key via both the file identity and k.
    val key = s"${f.getName}_${f.lastModified}_${f.length}" +
      s"_k${cells}_s${IvfSeed}_i$IvfIters"
    val base = sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props("java.io.tmpdir") + "/graft-index")
    s"$base/ivf_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_$key"
  }

  /** Load the persisted quantizer if one matches the corpus; fit (and
    * persist) only on true first touch. A cold session then pays one
    * small metadata read instead of a k-means fit — the IVF index
    * amortization every production ANN deployment relies on. */
  private def ivfModel(spark: SparkSession, sfDir: String, e: DataFrame,
                       cells: Int): KMeansModel =
    ivfCache.computeIfAbsent((spark, sfDir), _ => {
      val dir = ivfIndexPath(sfDir, cells)
      val onDisk =
        try {
          if (new java.io.File(dir, "metadata").exists)
            Some(KMeansModel.load(dir))
          else None
        } catch { case NonFatal(e) => warnIndexIo("ivf load", dir, e); None }
      onDisk.getOrElse {
        val m = new KMeans().setK(cells).setSeed(IvfSeed).setMaxIter(IvfIters)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(e)
        try m.write.overwrite().save(dir)
        catch { case NonFatal(e) => warnIndexIo("ivf save", dir, e) }
        m
      }
    })

  /** Fitted LSH models, same amortization contract as [[ivfModel]]:
    * the random hyperplanes are the index; fit once per corpus. */
  private val lshCache = lruCache[BucketedRandomProjectionLSHModel]()

  private val LshTables = 15
  private val LshBucketLen = 1.0
  private val LshSeed = 42

  /** On-disk home of the fitted LSH hyperplanes — same contract as
    * [[ivfIndexPath]]: keyed by corpus identity AND the model
    * hyperparameters, so a regenerated corpus or changed (tables,
    * bucketLength, seed) never serves a stale index. */
  private def lshIndexPath(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/embeddings.parquet")
    val key = s"${f.getName}_${f.lastModified}_${f.length}" +
      s"_t${LshTables}_b${LshBucketLen}_s$LshSeed"
    val base = sys.env.getOrElse("GRAFT_INDEX_DIR",
      sys.props("java.io.tmpdir") + "/graft-index")
    s"$base/lsh_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_$key"
  }

  /** Load the persisted hyperplanes if they match the corpus; fit and
    * persist only on true first touch (the sim3 [[ivfModel]] pattern —
    * a cold session pays a small metadata read, not a full LSH fit,
    * which was the 2nd-slowest cold bench entry in r6). */
  private def lshModel(spark: SparkSession, sfDir: String, e: DataFrame): BucketedRandomProjectionLSHModel =
    lshCache.computeIfAbsent((spark, sfDir), _ => {
      val dir = lshIndexPath(sfDir)
      val onDisk =
        try {
          if (new java.io.File(dir, "metadata").exists)
            Some(BucketedRandomProjectionLSHModel.load(dir))
          else None
        } catch { case NonFatal(e) => warnIndexIo("lsh load", dir, e); None }
      onDisk.getOrElse {
        val m = new BucketedRandomProjectionLSH()
          .setInputCol("features").setOutputCol("hashes")
          .setNumHashTables(LshTables).setBucketLength(LshBucketLen)
          .setSeed(LshSeed)
          .fit(e)
        try m.write.overwrite().save(dir)
        catch { case NonFatal(e) => warnIndexIo("lsh save", dir, e) }
        m
      }
    })

  /** Build (or load) the persisted ANN index structures for a corpus
    * — the OFFLINE step of any production ANN deployment, exposed so
    * a bench/deploy harness can run it outside its measured window.
    * Idempotent and cheap when the on-disk index already matches the
    * corpus (the mtime+size+hyperparam key above): then this is two
    * small metadata reads. After a corpus regeneration it pays the
    * one-time k-means / hyperplane fit HERE rather than inside the
    * first sim2/sim3 query (r9: a regenerated embeddings.parquet made
    * sim3's first probe carry a 14 s index build). */
  def ensureAnnIndexes(spark: SparkSession, sfDir: String): Unit = {
    val e = normalized(spark, sfDir)
    lshModel(spark, sfDir, e)
    ivfModel(spark, sfDir, e, ivfCellsFor(e.count()))
  }

  /** The clustered fixture corpus (see [[Clusters]]): one broadcast
    * join against the 20 seed rows, then a map-side zip_with — the
    * same shape a 100 TB synthetic-benchmark generator would use. */
  private[graft] def clusteredVecs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val seeds = e.filter(col("vec_id") < Clusters)
      .select(col("vec_id").as("c"), col("v").as("cv"))
    e.select(col("vec_id"), (col("vec_id") % Clusters).as("c"), col("v"))
      .join(broadcast(seeds), "c")
      .select(col("vec_id"),
        expr(s"zip_with(cv, v, (a, b) -> a + ${ClusterNoise}D * b)").as("v"))
  }

  /** The corpus plus an exact duplicate of row [[PlantedSrc]] under id
    * [[PlantedId]] (see the planted near-dup note above). */
  private[graft] def plantedVecs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    e.unionByName(e.filter(col("vec_id") === PlantedSrc)
      .select(lit(PlantedId).as("vec_id"), col("v")))
  }

  /** Exact cosine of every row vs the probe row (native expression;
    * probe broadcast). */
  private def cosineToProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val probe = e.filter(col("vec_id") === ProbeId).select(col("v").as("pv"))
    e.filter(col("vec_id") =!= ProbeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), expr("graft_cosine(v, pv)").as("cos_sim"))
  }

  private def topK(scored: DataFrame): DataFrame =
    scored.orderBy(col("cos_sim").desc)
      .limit(TopK)
      .select(col("vec_id"), round(col("cos_sim"), 4).as("cos_sim"))

  /** L2-normalized ml vectors for the bucketing models. */
  private def normalized(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir)
      .withColumn("nrm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
      .select(col("vec_id"),
        array_to_vector(expr("transform(v, x -> x / nrm)")).as("features"))

  /** Per-row top-k of scored (a_id, b_id, cos_sim) pairs. Rank on the
    * RAW cosine (round only the output) with b_id as the tie-break so
    * both engines rank identically. Implemented as the
    * [[graft.functions.TopKPairs]] bounded aggregate, not a window:
    * the window formulation compiles to WindowGroupLimit, which keeps
    * per-partition top-k before the exchange but still SORTS every
    * partition of the pair stream to do it — sim4's 4M-pair stream
    * spent ~2.9 s of 3.4 s in that sort at sf0.1. The aggregate keeps
    * a capacity-k insertion buffer per key (reject path: one compare),
    * aggregates map-side, and ships one ≤k buffer per (partition, key)
    * — same O(rows·k) exchange volume, no sort on either side. */
  private def topKPerRow(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("a_id"))
      .agg(expr(s"graft_topk_pairs(cos_sim, b_id, $k)").as("tk"))
      .select(col("a_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("a_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("p.id").as("b_id"), round(col("p.score"), 4).as("cos_sim"))

  /** Exact kNN JOIN: the top-k cosine neighbors for EVERY corpus row
    * (corpus×corpus), the all-rows generalization of sim1's single
    * probe — a training-data pipeline's "nearest neighbors per
    * document" verb. This is the declared exact ground truth: the
    * N²/P scored-pair stream never materializes (WindowGroupLimit
    * truncates per partition), but the scoring work is inherently
    * quadratic — at 100 TB you run [[knnJoinBlocked]] and accept its
    * measured recall, exactly like every production ANN system. */
  def knnJoinExact(e: DataFrame, k: Int): DataFrame = {
    // norms once per ROW (N sqrt-dots), dots once per PAIR (N²): a
    // third of graft_cosine's per-pair flops, bit-identical value
    // (graft_dot accumulates like the fused kernel's terms, and
    // dot/(na*nb) is the kernel's exact final expression)
    // streamed side spread: the N²/P pair scoring parallelizes over
    // the STREAMED side's partitions, and the fixture is one split
    val a = spread(e).select(col("vec_id").as("a_id"), col("v").as("va"),
      expr("sqrt(graft_dot(v, v))").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"),
      expr("sqrt(graft_dot(v, v))").as("nb"))
    val scored = a.crossJoin(broadcast(b))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos_sim"))
    topKPerRow(scored, k)
  }

  /** Blocked kNN join — the 100 TB path: banded hyperplane signatures
    * ([[graft.functions.HyperplaneBands]]) → (band, sig) equi-join for
    * candidate pairs → exact re-score of candidates only → per-row
    * top-k. Candidate generation shuffles on bounded band keys; no
    * cross product in the plan.
    *
    * Unlike dd5_blocked (a THRESHOLD query, where permissive bands can
    * guarantee recall and share the exact oracle), a top-k query has
    * no threshold to tune bands against: recall depends on how far the
    * true neighbors sit above the background similarity. On a corpus
    * with real cluster structure (neighbor cos ≫ background, the
    * regime where you'd deploy this) recall@k is ~1 and candidates are
    * ~cluster-sized — `PipelineSpec` pins both on a planted clustered
    * corpus. On structureless data (this repo's synthetic embeddings,
    * max pair cos ≈ 0.51 over a ≈0 background) NO sublinear method can
    * beat the exact join — so the oracle-gated entry is the exact one,
    * and this path is spec- and bench-verified instead.
    *
    * A row with fewer than k surviving candidates emits fewer than k
    * neighbors (standard ANN semantics; callers needing exactly k
    * re-probe with wider bands). */
  def knnJoinBlocked(e: DataFrame, k: Int, bits: Int, bands: Int,
                     seed: Int = 42, bucketCap: Int = 0): DataFrame = {
    // not persisted: knnFromSignatures consumes this once (its
    // vector-carrying join is what both self-join sides share)
    val sig = spread(e).select(col("vec_id"),
      posexplode(expr(s"graft_hyperplane_bands(v, $bits, $bands, $seed)"))
        .as(Seq("band", "sig")))
    // Dense-bucket candidate cap (the r8 sf1 scale finding): with a
    // FIXED (bits, bands), bucket occupancy grows linearly with the
    // corpus, so uncapped candidate pairs grow with Σ bucketSize² —
    // quadratic when the data has dense similarity clusters (which is
    // exactly when you deploy an ANN join). The cap keeps, per
    // (band, sig) bucket, at most `bucketCap` PARTNER-side rows chosen
    // by a deterministic per-band hash (probe side stays uncapped, so
    // every row still probes all its bands); candidate volume is then
    // ≤ N·bands·cap — linear. Inside a dense bucket the members are
    // mutual near-ties by construction, so the dropped partners are
    // interchangeable with the kept ones: top-k QUALITY survives even
    // where exact identity doesn't (spec-pinned both ways —
    // cap ≥ bucket size is provably a no-op, engaged cap retains full
    // per-row k and near-tie similarity). 0 disables.
    knnFromSignatures(e, sig, k, bucketCap,
      xxhash64(col("vec_id"), col("band")))
  }

  /** Corpus-count-aware blocked kNN join (r10 verdict #6: one plan
    * derivation for every banded consumer): (bits, bands) come from
    * the SCALE mode of [[HyperplaneBands.bandPlan]] at `tauFloor` (the
    * weakest neighbor similarity the deployment cares to recall), so
    * bucket occupancy — and with it per-row candidate volume — stays
    * bounded as the corpus grows, where any fixed (bits, bands) goes
    * quadratic (the r8 sf1 finding; dd10 measured the adaptive curve
    * at exponent 1.30 vs the fixed plan's 2.0). The fixed-plan
    * [[knnJoinBlocked]] remains the pinned-regression path the sim5/6
    * gates exercise. `n` defaults to a count of `e` — at 100 TB pass
    * the metastore row count instead. */
  def knnJoinBlockedAuto(e: DataFrame, k: Int, tauFloor: Double,
                         maxMiss: Double = 1e-4, bucketCap: Int = 0,
                         n: Option[Long] = None): DataFrame = {
    val (bits, bands) = HyperplaneBands.bandPlan(
      tauFloor, maxMiss, Some(n.getOrElse(e.count())))
    knnJoinBlocked(e, k, bits, bands, bucketCap = bucketCap)
  }

  /** The shared cap → band-join → exact-rescore → top-k core of the
    * blocked ANN join, over an ALREADY-COMPUTED (vec_id, band, sig)
    * signature frame. `capOrder` is the deterministic per-bucket
    * order the partner cap keeps rows by (sim6: xxhash64 — fastest;
    * sim7: md5-derived — the cross-engine-replicable variant that
    * makes the ENGAGED cap oracle-able). Factored so the engaged-
    * regime gate exercises the IDENTICAL cap/join/score/top-k code
    * the production sim6 path runs — only signature generation and
    * the tie-hash differ. */
  private[graft] def knnFromSignatures(e: DataFrame, sig: DataFrame,
      k: Int, bucketCap: Int, capOrder: Column): DataFrame = {
    // Vectors + norms ride ON the signature frame: one bounded vec_id
    // join per self-join side (N·bands signature rows against N
    // vectors), so every candidate pair is scored
    // WHERE IT IS BORN — inside the band join's partition — and the
    // duplicated candidate stream is never exchanged again. The r12
    // sf1 measurement that forced this shape: a pair in the clustered
    // fixture collides in up to all 64 permissive bands, and looking
    // vectors up AFTER the band join re-shuffled every duplicate
    // through two joins — 16.7 GB of spill and sim5 at 268 s (5× the
    // r11 distinct-based shape); scoring in-place costs bands× extra
    // persisted bytes (bounded: N·bands·dim floats) and one fused
    // 64-dim loop per duplicate, and the map-side partials of the
    // top-k aggregate absorb the duplicates before the one a_id
    // exchange. No distinct anywhere: graft_topk_pairs dedupes BY ID
    // inside its bounded buffer, so band duplicates cannot occupy
    // duplicate ranks.
    // r19 (guide §5 — the r18-verdict sf10 spill item): the CAP
    // window runs over the NARROW signature frame, not the
    // vector-carrying one. The former shape joined vectors in first
    // and then row_number'd the 500+B-wide rows — a full wide sort
    // per (band, sig), which at sf10 (200k vectors × 64 bands ×
    // ~530 B) is a multi-GiB spill; the cap's decision only reads
    // (band, sig, capOrder, vec_id), all present on the 24 B narrow
    // row. Vectors+norms then attach per SIDE (one bounded vec_id
    // join each), so scoring still happens where candidates are born
    // and the persisted footprint drops from N·bands·(vec+norm) to
    // the N·bands narrow signatures. Kept-partner set and scores are
    // value-identical: same window keys and order over the same
    // rows, same dot/(nrm·nrm) doubles.
    val sigN = sig.persist() // shared by the probe side, the cap
                             // window, and (capped) the partner side
    // persisted too: the corpus derivation (clusteredVecs' broadcast
    // join + zip_with) would otherwise run once per attach side; the
    // cache is N narrow vector rows, bounded like the signatures
    val vecsN = e.select(col("vec_id"), col("v"),
      expr("sqrt(graft_dot(v, v))").as("nrm")).persist()
    val partnerKeys = if (bucketCap > 0)
      sigN.withColumn("bkr", row_number().over(
          Window.partitionBy(col("band"), col("sig"))
            .orderBy(capOrder, col("vec_id"))))
        .filter(col("bkr") <= bucketCap).drop("bkr")
    else sigN
    val xSide = sigN.join(vecsN, "vec_id")
    val ySide = if (bucketCap > 0) partnerKeys.join(vecsN, "vec_id")
                else xSide
    // BOTH directions (a,b) and (b,a) survive — top-k is per-row and
    // directional.
    val scored = xSide.as("x").join(ySide.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        (expr("graft_dot(x.v, y.v)") /
          (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
    topKPerRow(scored, k)
  }


  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // int8 embedding quantization QA — the storage-compression op an
    // embedding store needs at 100 TB (4x smaller vectors): per-vector
    // absmax/127 scale, quantize, and report reconstruction-error
    // stats. Numeric discipline for the cross-engine hash: rounding is
    // the explicit floor(x/s + 0.5) on BOTH engines (their round()
    // HALF semantics differ), error energy goes through the same
    // graft_dot kernel the cosine oracles prove bit-deterministic
    // against DuckDB's list_dot_product, per-row doubles are
    // deterministic, and cross-row accumulation happens in DECIMAL
    // (exact, order-free) with one double division at the end. The
    // one residual caveat is the repo-wide round()-tie class (ADVICE
    // r4): the gated round(rel, 9/6) calls could disagree on an
    // exact decimal half-boundary — measure-zero on real doubles and
    // accepted everywhere else the oracles round. All work is
    // map-side; the only shuffle is the final scalar agg.
    "emb1_quantize" -> ((spark, sfDir) => {
      val rel = vecs(spark, sfDir)
        .withColumn("scale",
          expr("array_max(transform(v, x -> abs(x))) / 127.0"))
        .withColumn("err",
          expr("transform(v, x -> x - floor(x / scale + 0.5) * scale)"))
        .select(expr("graft_dot(v, v)").as("energy"),
          expr("graft_dot(err, err)").as("sq_err"))
        // zero vectors have no quantization error to score (and 0/0
        // diverges between engines: NaN vs NULL)
        .filter(col("energy") > 0)
        .withColumn("rel", col("sq_err") / col("energy"))
      rel.agg(count(lit(1)).as("n_vecs"),
        round(sum(expr("cast(round(rel, 9) as decimal(18,9))"))
          .cast("double") / count(lit(1)), 6).as("rel_mse"),
        round(max(col("rel")), 6).as("worst_rel_mse"),
        round(sum(when(col("rel") < 1e-4, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("frac_ok"))
    }),
    // Random-projection (Johnson–Lindenstrauss sign-sketch) dim
    // reduction: 64-d float vectors down to RpDims dims via a ±1
    // matrix derived from md5(j,k) — both engines regenerate the SAME
    // matrix from the hash, so the oracle is value-exact with no
    // side-channel for the projection. The gate reports per-(label,k)
    // first/second moments of the projected coordinate. Numeric
    // discipline: each signed term is exact (±x, no product rounding),
    // rounded to 9 decimals into DECIMAL so the per-vector sum and
    // the cross-vector sums are associative/order-free; DOUBLE only
    // at the output boundary. Scale shape: the sign matrix is
    // PRECOMPUTED once driver-side (rpSigns — the "build the
    // projection once and broadcast it" discipline; deriving it per
    // row cost 2.5M md5 calls at sf0.1) and inlined as a literal;
    // the projection itself is a per-row higher-order aggregate (no
    // explode of the vector through a shuffle), so the only
    // exchange carries the tiny (label,k) partial aggregates. The
    // DuckDB oracle re-derives the same matrix from md5 in SQL.
    "emb2_rand_proj" -> ((spark, sfDir) => {
      val e = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
      val dim = e.select(expr("size(v)")).head().getInt(0)
      val proj = e
        .select(col("label"), col("v"),
          explode(expr(s"sequence(0L, ${RpDims - 1}L)")).as("k"))
        .withColumn("p", expr(
          s"""aggregate(
             |  zip_with(v, element_at(${rpSignsSql(dim)}, cast(k + 1 as int)),
             |    (x, s) -> cast(round(x * s, 9) as decimal(18,9))),
             |  cast(0 as decimal(28,9)),
             |  (acc, t) -> cast(acc + t as decimal(28,9)))""".stripMargin))
      proj.groupBy(col("label"), col("k"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("p")).cast("double").as("proj_sum"),
          sum(expr("cast(round(cast(p as double) * cast(p as double), 6)" +
            " as decimal(28,6))")).cast("double").as("proj_sq_sum"))
        .orderBy(col("label"), col("k"))
    }),
    "sim1_cosine_topk" -> ((spark, sfDir) =>
      topK(cosineToProbe(spark, sfDir))),
    "sim4_knn_join" -> ((spark, sfDir) =>
      knnJoinExact(vecs(spark, sfDir), KnnK)),
    // the 100 TB ANN-join path, oracle-gated on the clustered fixture
    // (exact kNN SQL on the same derived corpus): band recall must be
    // 1 at this scale for the hash to match — a blocked result that
    // misses one true neighbor fails the gate
    "sim5_knn_blocked" -> ((spark, sfDir) =>
      knnJoinBlocked(clusteredVecs(spark, sfDir), KnnK, KnnBits, KnnBands)),
    // the capped variant: same plan plus the per-bucket partner cap
    // (see [[knnJoinBlocked]]) — the knob that keeps the ANN join
    // linear when cluster density grows with the corpus. At gate
    // scale the cap is provably dormant, so the exact oracle applies
    // unchanged; the scale divergence is deliberate and spec-pinned.
    "sim6_knn_capped" -> ((spark, sfDir) =>
      knnJoinBlocked(clusteredVecs(spark, sfDir), KnnK, KnnBits, KnnBands,
        bucketCap = KnnBucketCap)),
    // the ENGAGED-cap gate: same knnFromSignatures core as sim6, but
    // md5-derived hyperplanes + cap tie-hash make the DuckDB oracle
    // regenerate the identical ENGAGED result — cap 4 sits below the
    // fixture's bucket sizes at every sf, so partners are genuinely
    // dropped and the hash gate covers the regime a 100 TB user runs.
    "sim7_knn_engaged" -> ((spark, sfDir) => {
      val e = clusteredVecs(spark, sfDir)
      // knnFromSignatures persists its vector-carrying signature
      // frame for the two-sided band self-join; release rides on the
      // harness cleanup contract (Verify/Bench clear cached relations
      // after each query)
      val sig = srpSignatures(spark, e)
      knnFromSignatures(e, sig, KnnK, EngagedCap, expr(engagedCapOrderSql))
    }),
    "sim2_ann_lsh" -> ((spark, sfDir) => {
      val e = normalized(spark, sfDir)
      val model = lshModel(spark, sfDir, e)
      val probeVec = e.filter(col("vec_id") === ProbeId)
        .select(col("features")).head().getAs[org.apache.spark.ml.linalg.Vector](0)
      val candidateIds = model
        .approxNearestNeighbors(e.filter(col("vec_id") =!= ProbeId), probeVec, TopK)
        .select(col("vec_id"))
      topK(cosineToProbe(spark, sfDir).join(broadcast(candidateIds), "vec_id"))
    }),
    "sim3_ann_ivf" -> ((spark, sfDir) => {
      val e = normalized(spark, sfDir)
      // ADAPTIVE grid (see ivfCellsFor): cells ~ √n, probes a fixed
      // fraction of them; the count is one column-pruned aggregate —
      // the dd10/clu1 plan-derivation discipline. 5 iterations: a
      // coarse quantizer doesn't need convergence; the fit is cached
      // per (session, corpus) like a persisted IVF index header.
      val cells = ivfCellsFor(e.count())
      val nprobe = ivfProbesFor(cells)
      val model = ivfModel(spark, sfDir, e, cells)
      val assigned = model.transform(e).select(col("vec_id"), col("cell"))
      val probeVec = e.filter(col("vec_id") === ProbeId)
        .select(col("features")).head().getAs[org.apache.spark.ml.linalg.Vector](0)
      // nprobe nearest cells to the probe (centroids are tiny —
      // driver-side math, exactly like a real IVF index header)
      val probeCells = model.clusterCenters.zipWithIndex
        .map { case (c, i) =>
          (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, probeVec))
        }
        .sortBy(_._2).take(nprobe).map(_._1).toSeq
      val candidateIds = assigned
        .filter(col("cell").isin(probeCells: _*) && col("vec_id") =!= ProbeId)
        .select(col("vec_id"))
      // the chosen plan rides in the output (the dd10 contract: the
      // gate pins the adaptivity decision, not just the result)
      topK(cosineToProbe(spark, sfDir).join(broadcast(candidateIds), "vec_id"))
        .withColumn("cells", lit(cells.toLong))
        .withColumn("nprobe", lit(nprobe.toLong))
    }),
    // embedding-cosine near-dup: exact all-pairs ground truth (the
    // oracle-able baseline; dd5_blocked_neardup is the scale path)
    "dd5_embed_neardup" -> ((spark, sfDir) => {
      val e = vecs(spark, sfDir)
      val a = spread(e).select(col("vec_id").as("a_id"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
      a.crossJoin(broadcast(b))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          expr("graft_cosine(va, vb)").as("cos_sim"))
        .filter(col("cos_sim") >= NearDupThreshold)
        .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"))
    }),
    // blocked near-dup: banded hyperplane-LSH equi-join prefilter →
    // exact re-score. Must reproduce dd5's exact result (shared
    // oracle). (bits, bands) derive from the threshold via
    // HyperplaneBands.params — at the test corpus's deliberately weak
    // tau=0.4 the bands are permissive; at a production tau=0.9 the
    // same code prunes ~99% of random pairs (see params scaladoc).
    "dd5_blocked_neardup" -> ((spark, sfDir) =>
      blockedNearDup(spark, sfDir, NearDupThreshold)),
    // the SAME code at a production threshold: tau=0.9's (12,55)
    // bands prune ~99% of random pairs, so the bench entry measures
    // the pruning regime the scaladoc claims rather than dd5's
    // deliberately-permissive tau=0.4 (r3 verdict). The corpus is
    // augmented with ONE planted exact-duplicate row (both engines),
    // so the gate is two-sided: the bands must surface the planted
    // pair (recall) and admit no false pair (precision).
    "dd5_blocked_tau09" -> ((spark, sfDir) =>
      blockedNearDupOn(plantedVecs(spark, sfDir), 0.9)),
    // ADAPTIVE banding at the production threshold (the r9 weak-list
    // answer): (bits, bands) derive from the corpus count, so bucket
    // occupancy — and with it candidate volume per row — stays bounded
    // as the corpus grows, where every fixed plan goes quadratic. The
    // md5-derived hyperplanes make the WHOLE pipeline (count → plan →
    // signatures → candidates → re-score) value-identical in DuckDB,
    // and the chosen plan rides in the output columns — the gate pins
    // the decision, not just the result. Planted duplicate corpus:
    // identical vectors share every band signature structurally, so
    // recall of the planted pair is deterministic, not probabilistic.
    "dd10_adaptive_neardup" -> ((spark, sfDir) =>
      adaptiveNearDup(spark, plantedVecs(spark, sfDir)))
  )

  private def blockedNearDup(spark: SparkSession, sfDir: String, tau: Double): DataFrame =
    blockedNearDupOn(vecs(spark, sfDir), tau)

  /** Banded hyperplane-LSH near-dup at threshold `tau` over corpus `e`:
    * candidate equi-join on (band, signature) → exact cosine
    * re-score of candidates only. */
  private def blockedNearDupOn(e: DataFrame, tau: Double): DataFrame = {
    val (bits, bands) = HyperplaneBands.params(tau, 1e-4)
    // spread: signature generation AND the band self-join +
    // per-candidate scoring below all run on this frame's partitioning
    // (broadcast joins preserve it), and the fixture is one split
    val sig = spread(e).select(col("vec_id"),
      posexplode(expr(s"graft_hyperplane_bands(v, $bits, $bands, 42)"))
        .as(Seq("band", "sig")))
    // r19 (guide §5/§8 — the r18-verdict sf10 spill item): vectors +
    // norms ride ON the signature frame (the knnFromSignatures
    // score-where-born shape, r12-proven on the kNN paths), so every
    // candidate pair is scored INSIDE the band join's partition and
    // only the tau-survivors ever reach another exchange. The former
    // attach-after shape (bare-pair band join, then cand⋈va⋈vb name
    // lookups) broadcast fine at test scale but re-exchanged the FULL
    // candidate stream twice once the vector side outgrew the
    // broadcast threshold — at sf10 (200k vectors, tau09's (12,55)
    // plan, ~2.6e8 raw candidates) that was a 30+ GiB shuffle-spill
    // kill. Persisted cost is bounded: N·bands rows × (vec + norm).
    // Identical values: same candidate pairs (same band equi-join,
    // a<b), same dot/(na·nb) expression over the same doubles, same
    // tau filter, round, and post-filter distinct.
    // NOTE deliberately no distinct() on raw candidates: a pair
    // colliding in k bands is scored k times (the kernel is one
    // fused 64-dim loop — cheap), and dedupe happens AFTER the
    // threshold filter when only the few true pairs survive. A
    // pre-score distinct would shuffle the full candidate stream,
    // which at a permissive threshold is the bulk of all pairs.
    val withVec = sig.join(
        e.select(col("vec_id"), col("v"),
          expr("sqrt(graft_dot(v, v))").as("nrm")), "vec_id")
      .persist() // both self-join sides share one signature+vector pass
    withVec.as("x").join(withVec.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        (expr("graft_dot(x.v, y.v)") /
          (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"))
      .distinct()
  }

  /** Adaptive-plan candidate pairs over corpus `e`: derive (bits,
    * bands) from the corpus count via [[adaptiveBandPlan]], sign the
    * corpus with md5-derived SRP hyperplanes ([[srpSignatures]] — the
    * cross-engine-replicable variant, so the whole candidate set is
    * oracle-able), band equi-join with a < b. Returned WITH band
    * multiplicity (the dd5_blocked discipline: dedupe after the
    * threshold filter, when only true pairs survive — a pre-score
    * distinct would shuffle the bulk candidate stream). The returned
    * `sig` frame is PERSISTED (both self-join sides share one
    * signature pass): measurement callers unpersist it after their
    * action; the lazy gate path relies on the harness cleanup
    * contract (Verify/Bench clear cached relations per query). */
  private[graft] def adaptiveCandidates(spark: SparkSession,
      e: DataFrame): (DataFrame, DataFrame, Int, Int) = {
    val n = e.count() // 100 TB: a metastore stats lookup, not a scan
    val (bits, bands) = adaptiveBandPlan(n)
    val sig = srpSignatures(spark, e, bands, bits)
      .persist() // both self-join sides share one signature pass
    val cand = sig.as("x").join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
    (cand, sig, bits, bands)
  }

  /** dd10: adaptive-banding near-dup at [[AdaptiveTau]] — candidates
    * from [[adaptiveCandidates]], exact cosine re-score of candidates
    * only, threshold, dedupe. The chosen (bits, bands) ride along as
    * output columns, so the ADAPTIVITY DECISION itself is part of the
    * hash contract — an engine that derives a different plan from the
    * same corpus fails the gate, not just one that scores pairs
    * differently. */
  private[graft] def adaptiveNearDup(spark: SparkSession, e: DataFrame): DataFrame = {
    // r19: score-where-born (see blockedNearDupOn — the same
    // attach-after shape re-exchanged the candidate stream at scale).
    // adaptiveCandidates stays as the bare-pair probe/spec surface;
    // the gate path carries vectors+norms on the signature frame and
    // scores candidates inside the band join's partition. Identical
    // values: same (bits, bands) plan, same candidate pairs, same
    // dot/(na·nb) doubles, same tau filter / round / distinct.
    val n = e.count() // 100 TB: a metastore stats lookup, not a scan
    val (bits, bands) = adaptiveBandPlan(n)
    val withVec = srpSignatures(spark, e, bands, bits).join(
        e.select(col("vec_id"), col("v"),
          expr("sqrt(graft_dot(v, v))").as("nrm")), "vec_id")
      .persist() // both self-join sides share one signature+vector pass
    withVec.as("x").join(withVec.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        (expr("graft_dot(x.v, y.v)") /
          (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= AdaptiveTau)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 4).as("cos_sim"),
        lit(bits.toLong).as("bits"), lit(bands.toLong).as("bands"))
      .distinct()
  }

  /** All cosine oracles compute over vectors pre-cast to DOUBLE[]:
    * DuckDB's `list_dot_product` on FLOAT[] accumulates in float32
    * (~1e-7 off the double result), while the Spark side casts to
    * double before the kernel — the discrepancy landed one sf0.01
    * kNN pair on the wrong side of the round-to-4 boundary
    * (0.32574998 vs 0.32575003). With the cast, both engines run
    * left-to-right float64 accumulation and agree bitwise. */
  private val castCte =
    "WITH ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  /** Clustered-fixture CTE (sim5): DuckDB computes the identical
    * derived corpus — `p[1] + noise * p[2]` is the same left-to-right
    * float64 arithmetic as Spark's `zip_with(cv, v, (a,b) -> a+n*b)`,
    * so vectors (and hence cosines) are bit-identical. */
  private val clusterCte =
    s"""$castCte,
       |seeds AS (SELECT vec_id AS c, v AS cv FROM ed WHERE vec_id < $Clusters),
       |cl AS (
       |  SELECT e.vec_id,
       |    list_transform(list_zip(s.cv, e.v), p -> p[1] + $ClusterNoise * p[2]) AS v
       |  FROM ed e JOIN seeds s ON e.vec_id % $Clusters = s.c)""".stripMargin

  /** Planted-duplicate CTE (dd5_blocked_tau09). */
  private val plantedCte =
    s"""$castCte,
       |edp AS (SELECT vec_id, v FROM ed UNION ALL
       |        SELECT $PlantedId AS vec_id, v FROM ed WHERE vec_id = $PlantedSrc)""".stripMargin

  private def cosSql(a: String, b: String) =
    s"""list_dot_product($a.v, $b.v) /
       |    (sqrt(list_dot_product($a.v, $a.v)) *
       |     sqrt(list_dot_product($b.v, $b.v)))""".stripMargin

  private val topkOracleSql =
    s"""$castCte
       |SELECT e.vec_id, round(${cosSql("e", "p")}, 4) AS cos_sim
       |FROM ed e,
       |  (SELECT v FROM ed WHERE vec_id = $ProbeId) p
       |WHERE e.vec_id <> $ProbeId
       |ORDER BY ${cosSql("e", "p")} DESC
       |LIMIT $TopK""".stripMargin

  /** sim3's oracle: the exact top-k (an adaptive IVF at gate scale
    * has full recall, so result equality holds) PLUS the re-derived
    * adaptive plan columns — GREATEST/CEIL/SQRT over count(*) is the
    * identical IEEE arithmetic as ivfCellsFor/ivfProbesFor. */
  private val sim3OracleSql =
    s"""$castCte,
       |plan AS (
       |  SELECT cells,
       |    LEAST(cells, GREATEST($IvfMinProbes,
       |      CAST(ceil(cells * $IvfProbeFrac) AS BIGINT))) AS nprobe
       |  FROM (SELECT GREATEST($IvfMinCells,
       |          CAST(ceil(sqrt(count(*))) AS BIGINT)) AS cells
       |        FROM embeddings))
       |SELECT e.vec_id, round(${cosSql("e", "p")}, 4) AS cos_sim,
       |  pl.cells, pl.nprobe
       |FROM ed e,
       |  (SELECT v FROM ed WHERE vec_id = $ProbeId) p,
       |  plan pl
       |WHERE e.vec_id <> $ProbeId
       |ORDER BY ${cosSql("e", "p")} DESC
       |LIMIT $TopK""".stripMargin

  /** Exact-kNN SQL over corpus CTE `tbl`, prefixed by `cte`. */
  private def knnSql(cte: String, tbl: String) =
    s"""$cte
       |SELECT a_id, CAST(rnk AS BIGINT) AS rnk, b_id, round(cos_sim, 4) AS cos_sim
       |FROM (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${cosSql("a", "b")} AS cos_sim,
       |    row_number() OVER (
       |      PARTITION BY a.vec_id
       |      ORDER BY ${cosSql("a", "b")} DESC,
       |        b.vec_id) AS rnk
       |  FROM $tbl a, $tbl b
       |  WHERE a.vec_id <> b.vec_id)
       |WHERE rnk <= $KnnK""".stripMargin

  private val knnOracleSql = knnSql(castCte, "ed")

  /** sim7 oracle: an INDEPENDENT DuckDB formulation of the whole
    * engaged-cap ANN pipeline over the clustered fixture — ±1 SRP
    * hyperplanes re-derived from md5 (emb2's parity formula), dots
    * accumulated as exact LONG micro-units (floor(x·s·1e9 + 0.5) per
    * term — the same explicit floor-form both sides of emb1 use) so
    * every sign matches the Spark side exactly, 12-bit × 16-band
    * signatures, the md5-tie-hash partner cap at [[EngagedCap]]
    * (ENGAGED: buckets are bigger than the cap), band equi-join
    * candidates, exact cosine re-score, per-row top-[[KnnK]]. Every
    * stage is value-identical across engines, so the capped — not the
    * exact — result is the hash contract. */
  private val sim7OracleSql =
    s"""$clusterCte,
       |ex AS (
       |  SELECT vec_id, generate_subscripts(v, 1) - 1 AS kk, unnest(v) AS x
       |  FROM cl),
       |hp AS (
       |  SELECT c.c, j.j, k.kk,
       |    CASE WHEN CAST('0x' ||
       |      substr(md5('hp' || c.c || '_' || j.j || '_' || k.kk), 1, 4)
       |      AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
       |  FROM (SELECT unnest(range($EngagedBands)) AS c) c,
       |       (SELECT unnest(range($EngagedBits)) AS j) j,
       |       (SELECT DISTINCT kk FROM ex) k),
       |dots AS (
       |  SELECT e.vec_id, h.c AS band, h.j,
       |    sum(CAST(floor(e.x * h.s * 1e9 + 0.5) AS BIGINT)) AS dot
       |  FROM ex e JOIN hp h ON h.kk = e.kk
       |  GROUP BY e.vec_id, h.c, h.j),
       |sigs AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM dots GROUP BY vec_id, band),
       |capped AS (
       |  SELECT vec_id, band, sig FROM (
       |    SELECT vec_id, band, sig, row_number() OVER (
       |      PARTITION BY band, sig
       |      ORDER BY CAST('0x' || substr(md5('cap' || vec_id || '_' || band), 1, 15)
       |        AS BIGINT), vec_id) AS bkr
       |    FROM sigs) WHERE bkr <= $EngagedCap),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM sigs x JOIN capped y ON x.band = y.band AND x.sig = y.sig
       |    AND x.vec_id <> y.vec_id)
       |SELECT a_id, CAST(rnk AS BIGINT) AS rnk, b_id, round(cos_sim, 4) AS cos_sim
       |FROM (
       |  SELECT cd.a_id, cd.b_id, ${cosSql("a", "b")} AS cos_sim,
       |    row_number() OVER (PARTITION BY cd.a_id
       |      ORDER BY ${cosSql("a", "b")} DESC, cd.b_id) AS rnk
       |  FROM cand cd JOIN cl a ON a.vec_id = cd.a_id
       |    JOIN cl b ON b.vec_id = cd.b_id)
       |WHERE rnk <= $KnnK""".stripMargin

  /** dd10's bits→bands table as inlined CASE literals — evaluated once
    * driver-side from the closed form, so the oracle shares the exact
    * integers with no cross-engine float math (see [[adaptiveBands]]). */
  private def adaptiveBandsCaseSql: String =
    (AdaptiveBitsMin to AdaptiveBitsMax)
      .map(b => s"WHEN $b THEN ${adaptiveBands(b)}")
      .mkString("CASE bits ", " ", " END")

  /** dd10 oracle: an INDEPENDENT DuckDB formulation of the whole
    * adaptive pipeline over the planted corpus — corpus count → bits
    * (integer shift compare, min over the candidate range) → bands
    * (the inlined driver-evaluated table) → md5-derived ±1 SRP
    * hyperplanes sized by that plan → exact LONG micro-unit dots →
    * band signatures → a<b candidate equi-join → exact cosine
    * re-score at [[AdaptiveTau]]. Every stage is value-identical
    * across engines (the sim7/emb2 machinery), so the gate hashes the
    * adaptively-planned result INCLUDING the plan itself. The
    * coalesce in `pl` mirrors [[adaptiveBandPlan]]'s saturation at
    * [[AdaptiveBitsMax]]: past n > 2^24·16 the Spark side pins
    * bits=24, and without the fallback min(b) over an empty match
    * set would be NULL and silently empty the whole oracle — the two
    * formulations must agree on the saturation contract, not just
    * the common range. */
  private val dd10OracleSql =
    s"""$plantedCte,
       |nn AS (SELECT count(*) AS n FROM edp),
       |pl AS (
       |  SELECT coalesce(min(b), $AdaptiveBitsMax) AS bits
       |  FROM (SELECT unnest(range($AdaptiveBitsMin, ${AdaptiveBitsMax + 1})) AS b) t, nn
       |  WHERE (CAST(1 AS BIGINT) << b) * $AdaptiveTargetBucket >= nn.n),
       |pb AS (SELECT bits, $adaptiveBandsCaseSql AS bands FROM pl),
       |ex AS (
       |  SELECT vec_id, generate_subscripts(v, 1) - 1 AS kk, unnest(v) AS x
       |  FROM edp),
       |hp AS (
       |  SELECT c.c, j.j, k.kk,
       |    CASE WHEN CAST('0x' ||
       |      substr(md5('hp' || c.c || '_' || j.j || '_' || k.kk), 1, 4)
       |      AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
       |  FROM (SELECT unnest(range((SELECT bands FROM pb))) AS c) c,
       |       (SELECT unnest(range((SELECT bits FROM pb))) AS j) j,
       |       (SELECT DISTINCT kk FROM ex) k),
       |dots AS (
       |  SELECT e.vec_id, h.c AS band, h.j,
       |    sum(CAST(floor(e.x * h.s * 1e9 + 0.5) AS BIGINT)) AS dot
       |  FROM ex e JOIN hp h ON h.kk = e.kk
       |  GROUP BY e.vec_id, h.c, h.j),
       |sigs AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM dots GROUP BY vec_id, band),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
       |    AND x.vec_id < y.vec_id)
       |SELECT cd.a_id, cd.b_id, round(${cosSql("a", "b")}, 4) AS cos_sim,
       |  CAST(pb.bits AS BIGINT) AS bits, CAST(pb.bands AS BIGINT) AS bands
       |FROM cand cd JOIN edp a ON a.vec_id = cd.a_id
       |  JOIN edp b ON b.vec_id = cd.b_id, pb
       |WHERE ${cosSql("a", "b")} >= $AdaptiveTau""".stripMargin

  private val emb1OracleSql =
    s"""$castCte,
       |q AS (SELECT vec_id, v,
       |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       |      FROM ed),
       |e AS (SELECT list_dot_product(v, v) AS energy,
       |        list_dot_product(
       |          list_transform(v, x -> x - floor(x / scale + 0.5) * scale),
       |          list_transform(v, x -> x - floor(x / scale + 0.5) * scale))
       |          AS sq_err
       |      FROM q),
       |r AS (SELECT sq_err / energy AS rel FROM e WHERE energy > 0)
       |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       |  round(CAST(sum(CAST(round(rel, 9) AS DECIMAL(18,9))) AS DOUBLE)
       |        / count(*), 6) AS rel_mse,
       |  round(max(rel), 6) AS worst_rel_mse,
       |  round(sum(CASE WHEN rel < 1e-4 THEN 1 ELSE 0 END) * 1.0
       |        / count(*), 6) AS frac_ok
       |FROM r""".stripMargin

  val oracle: Map[String, String] = Map(
    "emb1_quantize" -> emb1OracleSql,
    // same md5-derived ±1 matrix regenerated in DuckDB (0x-prefix
    // hex cast ≡ Spark's conv(...,16,10) — the io-gate equivalence);
    // generate_subscripts is 1-based, hence j-1
    "emb2_rand_proj" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    generate_subscripts(embedding, 1) - 1 AS j,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings
         |), t AS (
         |  SELECT e.*, k.k FROM e,
         |    (SELECT unnest(range(${RpDims})) AS k) k
         |), p AS (
         |  SELECT vec_id, label, k,
         |    sum(CAST(round(x * (CASE WHEN CAST('0x' ||
         |      substr(md5('rp' || j || '_' || k), 1, 4) AS BIGINT) % 2 = 0
         |      THEN 1.0 ELSE -1.0 END), 9) AS DECIMAL(18,9))) AS p
         |  FROM t GROUP BY vec_id, label, k
         |)
         |SELECT label, k, count(*) AS n_vecs,
         |  CAST(sum(p) AS DOUBLE) AS proj_sum,
         |  CAST(sum(CAST(round(CAST(p AS DOUBLE) * CAST(p AS DOUBLE), 6)
         |    AS DECIMAL(28,6))) AS DOUBLE) AS proj_sq_sum
         |FROM p GROUP BY label, k ORDER BY label, k""".stripMargin,
    "sim1_cosine_topk" -> topkOracleSql,
    "sim4_knn_join" -> knnOracleSql,
    // the blocked ANN-join path vs exact kNN on the clustered fixture:
    // a single missed true neighbor breaks the hash
    "sim5_knn_blocked" -> knnSql(clusterCte, "cl"),
    // cap dormant at gate scale (bucket ≤ cluster size 25 < 64) —
    // identical result, same exact-kNN oracle
    "sim6_knn_capped" -> knnSql(clusterCte, "cl"),
    // the ENGAGED cap has its own full-pipeline oracle — the capped
    // result, not the exact one, is the contract
    "sim7_knn_engaged" -> sim7OracleSql,
    // both approximate paths must equal the exact path at test scale
    "sim2_ann_lsh" -> topkOracleSql,
    // sim3 additionally pins its ADAPTIVE (cells, nprobe) derivation —
    // re-derived from count(*) like dd10's banding plan
    "sim3_ann_ivf" -> sim3OracleSql,
    "dd5_embed_neardup" -> dd5OracleSql(NearDupThreshold, castCte, "ed"),
    // blocked path must equal the exact path — shared oracle is the gate
    "dd5_blocked_neardup" -> dd5OracleSql(NearDupThreshold, castCte, "ed"),
    // production threshold over the planted corpus: the exact result is
    // exactly the planted pair, so the gate is two-sided (recall AND
    // precision)
    "dd5_blocked_tau09" -> dd5OracleSql(0.9, plantedCte, "edp"),
    // the adaptive plan AND its result are the contract — see
    // dd10OracleSql's doc
    "dd10_adaptive_neardup" -> dd10OracleSql
  )

  private def dd5OracleSql(tau: Double, cte: String, tbl: String) =
      s"""$cte
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${cosSql("a", "b")}, 4) AS cos_sim
         |FROM $tbl a, $tbl b
         |WHERE a.vec_id < b.vec_id
         |  AND ${cosSql("a", "b")} >= $tau""".stripMargin
}
