package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-data-pipeline operator tests at sf0.001. The driver's DuckDB
  * oracle is the cross-engine gate; these specs pin the *internal*
  * invariants: approximate paths equal exact paths, sketches have the
  * declared shapes, and the stubbed multimodal plumbing conserves
  * bytes.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("df-capped dd2 equals the unrestricted exact-jaccard join") {
    // dd2's candidate generation drops hot shingles (df > MaxShingleDf)
    // from the self-join; verification runs on full sets. The result
    // must still be EXACTLY the unrestricted ground truth.
    val ex = Dedup.shingles(spark, sf)
    val truth = Dedup.exactPairsGroundTruth(ex, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = SparkEntry.queries("dd2_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(truth.nonEmpty)
    assert(capped == truth)
  }

  test("dd2 plan is df-capped: bounded collect present, no cartesian product") {
    val plan = SparkEntry.queries("dd2_ngram_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the bounded-buffer collect aggregate is what caps candidate
    // generation (one corpus shuffle, <= K+1 entries per key)
    assert(plan.contains("graft_collect_capped"),
      s"df-cap bounded collect missing:\n$plan")
    // and the raw corpus-sized self-join on shingle hash must be gone
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("collect_capped buffers never exceed the limit and mark overflow") {
    import spark.implicits._
    graft.functions.CollectCappedLongs.register(spark)
    val df = Seq.tabulate(100)(i => (i % 3).toLong -> i.toLong)
      .toDF("k", "v")
      .repartition(8)
      .groupBy("k")
      .agg(expr("graft_collect_capped(v, 5)").as("vs"))
      .select(col("k"), size(col("vs")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // every key has 33-34 values, far over the cap: all buffers stop at 5
    assert(df.values.toSet == Set(5), df.toString)
    // and under the cap, everything is kept
    val under = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("k", "v")
      .groupBy("k").agg(expr("graft_collect_capped(v, 5)").as("vs"))
      .select(col("k"), size(col("vs")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(under == Map(1L -> 2, 2L -> 1), under.toString)
  }

  /** Independent single-machine dd11: map each n-gram STRING (no
    * hashing) to its distinct doc set, mark positions whose gram
    * appears in 2..cap docs, merge overlapping/adjacent [p, p+n-1]
    * intervals, roll up per doc. */
  private def bruteForceSpans(docs: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long)] = {
    val n = Dedup.SpanN
    val gramDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
    docs.foreach { case (id, w) =>
      w.sliding(n).filter(_.size == n).foreach { g =>
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    docs.flatMap { case (id, w) =>
      val dupPos = w.sliding(n).zipWithIndex.collect {
        case (g, i) if g.size == n &&
          { val d = gramDocs(g).size; d >= 2 && d <= Dedup.SpanDfCap } =>
          i + 1 // 1-based
      }.toSeq
      if (dupPos.isEmpty) None else {
        val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        dupPos.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.size - 1) = (spans.last._1, p + n - 1)
          else spans += ((p, p + n - 1))
        }
        val lens = spans.map { case (s, e) => e - s + 1 }
        Some(id -> ((spans.size.toLong, lens.sum.toLong, lens.max.toLong)))
      }
    }.toMap
  }

  test("dd11 repeated spans equal an in-memory brute-force recomputation") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toSeq
    val expect = bruteForceSpans(docs)
    val got = SparkEntry.queries("dd11_repeated_spans")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expect.keySet,
      s"doc sets differ: +${got.keySet -- expect.keySet} -${expect.keySet -- got.keySet}")
    got.foreach { case (id, v) =>
      assert(v == expect(id), s"doc $id: got $v expect ${expect(id)}")
    }
    // structural floor: every span covers at least one whole 8-gram
    assert(got.values.forall { case (ns, dt, ms) =>
      ns >= 1 && ms >= Dedup.SpanN && dt >= ms })
    // the gate persists its gram frame (Verify/Bench clear it between
    // queries) — mirror that contract so it doesn't leak into the suite
    spark.catalog.clearCache()
  }

  test("dd11 spans match brute force on adversarial random corpora") {
    // tiny vocab + shared templates force heavy gram collisions,
    // overlapping islands, exact-duplicate docs, and sub-8-token
    // docs — the island-merge edge cases the fixture corpus is too
    // tame to hit
    import spark.implicits._
    val rng = new scala.util.Random(90210L)
    val vocab = Vector("a", "b", "c", "d")
    (1 to 3).foreach { round =>
      val template =
        Vector.fill(12 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val docs: Seq[(Long, Seq[String])] = (0L until 10L).map { id =>
        val body = rng.nextInt(4) match {
          case 0 => template // exact duplicate of the template
          case 1 => // template with a mutated middle: split islands
            template.updated(template.size / 2, "zz" + id)
          case 2 => // short doc, possibly under the 8-token floor
            Vector.fill(rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
          case _ => // random doc over the tiny vocab
            Vector.fill(8 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size)))
        }
        id -> (body: Seq[String])
      }
      val toks = docs.map { case (id, w) => (id, w) }
        .toDF("doc_id", "w")
      val got = Dedup.repeatedSpansOf(toks).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val expect = bruteForceSpans(docs)
      assert(got == expect,
        s"round $round: got $got\nexpect $expect\ncorpus ${docs.toMap}")
      spark.catalog.clearCache() // one persisted gram frame per round
    }
  }

  test("minhash LSH near-dup equals exact n-gram jaccard") {
    val exact = pairs("dd2_ngram_jaccard")
    val lsh = pairs("dd3_minhash_lsh")
    assert(exact.nonEmpty)
    assert(lsh == exact) // recall AND precision 1 after verification
  }

  test("minhash signatures have 96 components") {
    val sig = Dedup.minhashSignatures(
      Dedup.shingles(spark, sf)).select("sig").head()
      .getSeq[Long](0)
    assert(sig.length == 96)
  }

  test("fused minhash sketch is value-identical to the unrolled min(xxhash64) form") {
    // the aggregate claims bit-compatibility with
    // agg(min(xxhash64(h, 0)), ..., min(xxhash64(h, 95))) — pin it on
    // the real corpus, not synthetic rows
    val ex = Dedup.shingles(spark, sf)
    val fused = Dedup.minhashSignatures(ex).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val unrolled = ex.groupBy(col("doc_id"))
      .agg(min(xxhash64(col("h"), lit(0))).as("m0"),
        (1 until 96).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 96).map(i => r.getLong(i)).toVector).toMap
    assert(fused.keySet == unrolled.keySet)
    fused.foreach { case (id, sig) =>
      assert(sig == unrolled(id), s"sketch mismatch for doc $id")
    }
  }

  test("fused simhash is value-identical to the unrolled bit-sum form") {
    val fused = Dedup.simhashes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pre-r6 formulation: 64 signed bit sums + sign recombination
    // (r10: over the same md5-derived 60-bit token hash the fused
    // path and the DuckDB oracle use — bits 60..63 sum negative in
    // both forms, so the full-64-bit comparison still holds)
    val ex = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")))
      .toDF("doc_id", "pos", "t")
      .select(col("doc_id"), expr(Dedup.simhashTokenHashSql).as("h"))
    def bitSum(b: Int) =
      sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1L).otherwise(-1L)).as(s"s$b")
    val sums = ex.groupBy(col("doc_id")).agg(bitSum(0), (1 until 64).map(bitSum): _*)
    val combined = (0 until 64)
      .map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L))
      .reduce(_ bitwiseOR _)
    val unrolled = sums.select(col("doc_id"), combined.as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == unrolled)
  }

  test("simhash finds planted near-dups with high precision") {
    val exact = pairs("dd2_ngram_jaccard")
    val sim = pairs("dd4_simhash")
    assert(sim.nonEmpty)
    // simhash measures weighted-bit similarity, not Jaccard — pairs
    // slightly below J=0.8 can land inside hamming<=3, so precision
    // against the J>=0.8 set is high-but-not-1; recall of the planted
    // ~J=0.95+ dups should be solid
    assert((sim -- exact).size <= sim.size / 3, s"low precision: $sim vs $exact")
    assert((exact & sim).size >= exact.size / 2, "low recall")
  }

  test("simhash planted near-dups: hamming-3 found, same-band hamming-4 rejected") {
    import spark.implicits._
    // Two-sided planted gate over the REAL corpus fingerprints (the
    // dd5_blocked_tau09 pattern): pick a live doc as the source, then
    //  - plant A: its simhash with 3 bits flipped in DISTINCT 15-bit
    //    bands (bits 0, 16, 32 → bands 0, 1, 2) — hamming 3.
    //    Pigeonhole: band 3 is intact, so banding MUST surface it and
    //    the filter MUST keep it (recall side).
    //  - plant B: 4 bits flipped inside ONE band (bits 0..3) —
    //    hamming 4. Three intact bands make it a GUARANTEED candidate,
    //    so its absence from the output proves the hamming<=3
    //    verification actually rejects it (precision side), not that
    //    banding happened to miss it.
    val real = Dedup.simhashes(spark, sf)
    val src = real.orderBy(col("doc_id")).head()
    val (srcId, srcSig) = (src.getLong(0), src.getLong(1))
    val plantA = 9000001L -> (srcSig ^ ((1L << 0) | (1L << 16) | (1L << 32)))
    val plantB = 9000002L -> (srcSig ^ 15L)
    val planted = real.unionByName(
      Seq(plantA, plantB).toDF("doc_id", "simhash"))
    val baseline = Dedup.simhashNearDupPairs(real).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.simhashNearDupPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    val gotPairs = got.map(t => (t._1, t._2))
    assert(gotPairs.contains((srcId, plantA._1)),
      s"planted hamming-3 near-dup not found: $got")
    assert(got.contains((srcId, plantA._1, 3L)))
    assert(!gotPairs.exists(p => p._1 == plantB._1 || p._2 == plantB._1),
      s"hamming-4 plant survived the verification filter: $got")
    // the plants perturb nothing else: everything except pairs
    // touching the plants is exactly the unplanted result
    val untouched = gotPairs.filterNot(p =>
      Set(plantA._1, plantB._1).exists(id => p._1 == id || p._2 == id))
    assert(untouched == baseline)
  }

  test("LSH ANN equals exact brute-force cosine top-k") {
    val exact = SparkEntry.queries("sim1_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val ann = SparkEntry.queries("sim2_ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(exact.size == 10)
    assert(ann == exact)
  }

  test("cosine scores are in [-1, 1] and probe excluded") {
    val rows = SparkEntry.queries("sim1_cosine_topk")(spark, sf).collect()
    assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0))
    assert(!rows.exists(_.getLong(0) == 0L))
  }

  test("IVF ANN equals exact brute-force cosine top-k") {
    val exact = SparkEntry.queries("sim1_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val rows = SparkEntry.queries("sim3_ann_ivf")(spark, sf).collect()
    val ivf = rows.map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(ivf == exact)
    // the adaptive plan columns carry the √n derivation (r14 #4):
    // re-derive from the corpus count and pin
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val cells = graft.pipeline.Similarity.ivfCellsFor(n)
    val nprobe = graft.pipeline.Similarity.ivfProbesFor(cells)
    assert(rows.forall(r => r.getLong(2) == cells.toLong &&
      r.getLong(3) == nprobe.toLong))
    // the formula itself: floors at (16, 12), grows as √n with the
    // 3/4 probe fraction
    assert(graft.pipeline.Similarity.ivfCellsFor(256L) == 16)
    assert(graft.pipeline.Similarity.ivfCellsFor(20000L) == 142)
    assert(graft.pipeline.Similarity.ivfProbesFor(142) == 107)
    assert(graft.pipeline.Similarity.ivfProbesFor(16) == 12)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = SparkEntry.queries("dd5_embed_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, c) => a < b && c >= 0.4 && c <= 1.0 })
  }

  test("blocked embedding near-dup equals exact all-pairs (shared oracle)") {
    val exact = SparkEntry.queries("dd5_embed_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = SparkEntry.queries("dd5_blocked_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(blocked == exact) // recall AND precision 1 after re-score
    // the scale contract: no cross product anywhere in the blocked plan
    val plan = SparkEntry.queries("dd5_blocked_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("partitioned read prunes at the directory level (PartitionFilters)") {
    val plan = graft.pipeline.CorpusIO.partitionedRead(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not become a partition filter:\n$plan")
    // and it must NOT degrade to a post-scan data filter on lang
    assert(!plan.contains("PushedFilters: [IsNotNull(lang"), plan)
  }

  test("partitioned read opens only the pruned partition's files (scan metrics)") {
    // plan-text PartitionFilters (previous test) proves intent; this
    // proves EFFECT: after execution, the scan's numFiles metric must
    // equal the file count under lang=en/ alone — directory pruning
    // asserted on what was actually listed, not on plan strings.
    val df = graft.pipeline.CorpusIO.partitionedRead(spark, sf)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    val root = new java.io.File(
      scan.relation.location.rootPaths.head.toUri.getPath)
    def parquetsUnder(d: java.io.File): Int = {
      val kids = Option(d.listFiles).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(parquetsUnder).sum
    }
    val enFiles = parquetsUnder(new java.io.File(root, "lang=en"))
    val allFiles = parquetsUnder(root)
    assert(enFiles > 0 && enFiles < allFiles,
      s"fixture degenerate: en=$enFiles all=$allFiles")
    assert(scan.metrics("numFiles").value == enFiles,
      s"scan listed ${scan.metrics("numFiles").value} files, " +
        s"lang=en/ holds $enFiles of $allFiles")
  }

  test("io13 time travel: COW shares untouched groups; v1 is byte-stable " +
    "under a v2 re-commit (snapshot isolation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tt_spec")
    try {
      val (v1, v2) = graft.pipeline.CorpusIO
        .timeTravelVersions(spark, sf, dir.toString)
      // manifest mechanics: every v2 group except the rewrite IS a v1
      // group (same physical path — storage shared, not copied), and
      // exactly one rewrite group exists
      val shared = v1.toSet intersect v2.toSet
      assert(shared.nonEmpty, "COW shared no groups — tail-local batch " +
        "rewrote the whole table")
      // the committed manifest FILES resolve to exactly these groups
      // (the read path the gate takes)
      assert(graft.pipeline.CorpusIO.timeTravelManifest(dir.toString, 1) == v1)
      assert(graft.pipeline.CorpusIO.timeTravelManifest(dir.toString, 2) == v2)
      assert((v2.toSet -- v1.toSet).size == 1,
        s"expected exactly one rewrite group: ${v2.toSet -- v1.toSet}")
      assert(v2.toSet - (v2.toSet -- v1.toSet).head == shared)
      // snapshot isolation: a later writer producing ANOTHER version
      // only ever writes NEW groups — overwrite the rewrite group
      // with different content and assert the v1 read is
      // byte-identical (v1's groups are immutable data files)
      def v1Rollup(): Seq[String] =
        spark.read.parquet(v1: _*).orderBy(org.apache.spark.sql.functions
            .col("doc_id"))
          .collect().map(_.toString).toSeq
      val before = v1Rollup()
      val rw = (v2.toSet -- v1.toSet).head
      spark.read.parquet(v1.head).limit(3)
        .write.mode("overwrite").parquet(rw)
      assert(v1Rollup() == before,
        "v1 content changed under a v2-group rewrite")
    } finally graft.pipeline.CorpusIO.deleteRec(dir.toFile)
  }

  test("upsert merge applies CDC without shuffling the corpus") {
    val merged = graft.pipeline.CorpusIO.upsertMergePlan(spark, sf)
    val plan = merged.queryExecution.executedPlan.toString
    // the CDC key set broadcasts; the base never moves
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti-join did not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"corpus shuffled to apply a batch of edits:\n$plan")
    // row accounting: base keeps non-updated rows; updates replace
    // 1:1; inserts are net-new
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val base = docs.count()
    val nIns = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 11 === 0).count()
    assert(merged.count() == base + nIns)
  }

  test("emb2 projection is map-side: only the moment agg and sort shuffle") {
    // the per-vector JL projection must happen inside a higher-order
    // aggregate (no per-element explode through an exchange); the
    // plan's only exchanges carry the tiny (label,k) partial
    // aggregates and the 80-row final sort
    val df = SparkEntry.queries("emb2_rand_proj")(spark, sf)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2,
      s"emb2 shuffles ${exchanges.size}x — projection left the map side")
    val rows = df.collect()
    val nVecs = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs * 8,
      "every vector must contribute to every projected dim")
  }

  test("dc1 gram stream keeps the HOF explode generator-inlined") {
    // Regression pin for the 15x dc1 slowdown: the n-gram transform
    // must be evaluated INSIDE Generate's generator, not projected
    // into an intermediate array column that Generate then unnests
    // (the projected form materializes each doc's full gram array
    // into row format between two interpreted operators).
    val plan = Dedup.decontamGrams(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode(if"),
      s"gram explode not generator-inlined:\n$plan")
  }

  test("connected components: min-id canonicals, O(log diameter) rounds") {
    import spark.implicits._
    // a 100-node PATH (worst-case diameter for its size) plus a
    // disjoint triangle: hash-to-min + pointer jumping must resolve
    // the path in ~log2(100) rounds, nowhere near the 25-round cap —
    // pin that with an explicit 8-round budget.
    val path = (0L until 99L).map(i => (i, i + 1))
    val tri = Seq((1000L, 1001L), (1001L, 1002L), (1000L, 1002L))
    val edges = (path ++ tri).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(edges, maxIters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 103)
    assert((0L to 99L).forall(labels(_) == 0L))
    assert((1000L to 1002L).forall(labels(_) == 1000L))
    // empty graph: total function, empty result
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
  }

  test("connected components honor the reliable-checkpoint flag") {
    import spark.implicits._
    // spark.graft.cc.reliableCheckpoint=true routes CC snapshots
    // through reliable checkpoint() (cluster-safe, survives executor
    // loss) instead of localCheckpoint — identical labels either way
    val edges = ((0L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L))).toDF("a_id", "b_id")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_cc_ck")
    val prevCk = Option(spark.sparkContext.getCheckpointDir.orNull)
    spark.sparkContext.setCheckpointDir(ckDir.toString)
    spark.conf.set("spark.graft.cc.reliableCheckpoint", "true")
    try {
      val labels = Dedup.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L to 20L).forall(labels(_) == 0L))
      assert(labels(100L) == 100L && labels(101L) == 100L)
      // reliable checkpoints actually landed in the configured dir
      assert(new java.io.File(ckDir.toString).listFiles().nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.cc.reliableCheckpoint")
      prevCk.foreach(spark.sparkContext.setCheckpointDir)
    }
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260813L)
    (1 to 5).foreach { trial =>
      // sparse random graph: isolated pairs, chains, and blobs mixed
      val n = 60 + rng.nextInt(60)
      val edges = Seq.fill(n) {
        val a = rng.nextInt(200).toLong
        val b = rng.nextInt(200).toLong
        if (a == b) (a, b + 1) else (a, b)
      }
      // driver-side union-find ground truth with min-id roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb)
          parent(math.max(ra, rb)) = lo }
      }
      val truth = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"trial $trial: CC labels diverge from union-find")
    }
  }

  test("dd6 clusters are the transitive closure of dd2 pairs") {
    val dupPairs = pairs("dd2_ngram_jaccard")
    val clusters = SparkEntry.queries("dd6_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val canonOf = clusters.map(c => c._1 -> c._2).toMap
    // membership: exactly the docs that appear in some dup pair
    assert(canonOf.keySet == dupPairs.flatMap(p => Seq(p._1, p._2)))
    // every scored pair lands in one cluster
    assert(dupPairs.forall(p => canonOf(p._1) == canonOf(p._2)))
    // canonical is the min id of its cluster, and is itself a member
    val byCanon = clusters.groupBy(_._2)
    byCanon.foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon)
      // cluster_size is consistent across the cluster's rows
      assert(members.map(_._3).toSet == Set(members.length.toLong))
    }
  }

  test("df-cap blind spot: >K duplicate cluster is missed by dd2, caught by dd3") {
    // the documented trade-off of bounding the dd2 self-join: a
    // duplicate cluster larger than MaxShingleDf makes every shared
    // shingle hot, so capped candidate generation emits nothing for
    // it — while dd3's banded MinHash candidates (no df cap) surface
    // every pair of the cluster. Plant a 70-doc cluster (K=64) and
    // assert exactly that split.
    import spark.implicits._
    val common = (1L to 50L).map(i => i * 1000003L)
    val rows = (0 until 70).map { d =>
      (d.toLong, common ++ Seq(9000000000L + d)) // J = 50/52 ≈ 0.96
    }
    val sets = rows.toDF("doc_id", "hs")
    val ex = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    graft.functions.CollectCappedLongs.register(spark)
    assert(Dedup.cappedCandidates(ex).count() == 0,
      "capped generation unexpectedly produced candidates for a hot cluster")
    val banded = Dedup.verifiedPairs(sets, Dedup.bandedCandidates(ex), 0.8)
    assert(banded.count() == 70L * 69 / 2,
      "dd3's banded candidates must cover the full duplicate cluster")
    // dd6 rides the banded path for exactly this reason: cluster
    // resolution over the mass-duplicate regime must see the pairs
    // the capped path drops — all 70 docs collapse to canonical 0
    val labels = Dedup.connectedComponents(banded.select(col("a_id"), col("b_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 70 && labels.values.forall(_ == 0L),
      s"mass-dup cluster must resolve to one canonical: $labels")
  }

  test("kNN join: k neighbors per row, ranked, self-free, sim1-consistent") {
    val rows = SparkEntry.queries("sim4_knn_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = SparkEntry.queries("sim4_knn_join")(spark, sf)
      .select("a_id").distinct().count()
    assert(n == 500 && rows.length == 500 * 5)
    assert(rows.forall { case (a, _, b, _) => a != b })
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to 5L))
      // scores non-increasing in rank
      assert(byRank.map(_._4).sliding(2).forall(p => p.head >= p.last - 1e-9))
    }
    // probe row 0's top-5 must agree with sim1's (top-10) head
    val sim1 = SparkEntry.queries("sim1_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).take(5)
    val knn0 = rows.filter(_._1 == 0L).sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(knn0 == sim1.toSeq)
  }

  test("kNN join plan: bounded top-k aggregate, no sort, no full-stream " +
      "exchange after scoring") {
    // r12: topKPerRow moved from WindowGroupLimit (which still sorts
    // every partition of the pair stream) to the graft_topk_pairs
    // bounded aggregate — the plan must show the object agg with a
    // map-side partial, and NO sort anywhere (the point of the move).
    val plan = SparkEntry.queries("sim4_knn_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_topk_pairs"), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("blocked kNN join: full recall and no cross product on clustered data") {
    // the regime the blocked path is FOR: real cluster structure
    // (neighbor cos ~0.9+ over a ~0 background). 20 planted clusters
    // of 6; every row's true top-5 is its 5 cluster siblings.
    val rnd = new scala.util.Random(4242)
    def unit(dim: Int): Array[Double] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / nrm)
    }
    val rows = for {
      c <- 0 until 20
      center = unit(64)
      m <- 0 until 6
    } yield {
      val v = center.zip(Array.fill(64)(rnd.nextGaussian() * 0.03))
        .map { case (x, nz) => x + nz }
      (c * 6L + m, v)
    }
    import spark.implicits._
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.HyperplaneBands.register(spark)
    val exact = Similarity.knnJoinExact(e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val blocked = Similarity.knnJoinBlocked(e, 5, bits = 10, bands = 60)
    val got = blocked.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.size == 120 * 5)
    assert(got == exact, "blocked kNN lost a true neighbor on clustered data")
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("auto-planned kNN join: unified bandPlan derives the plan from the " +
      "corpus count; recall matches exact on clustered data") {
    import graft.functions.HyperplaneBands
    // ONE derivation function (r10 verdict #6): the fixed mode must
    // reproduce the dd5_blocked gates' pinned plans EXACTLY (these
    // are the fixed-plan regression checks)...
    assert(HyperplaneBands.params(0.9, 1e-4) == (12, 55))
    assert(HyperplaneBands.params(0.4, 1e-4) == (4, 54))
    // ...and the scale mode is what dd10's adaptiveBandPlan delegates
    // to — same table, bits monotone in n
    assert(Similarity.adaptiveBandPlan(501L) ==
      HyperplaneBands.bandPlan(Similarity.AdaptiveTau,
        1.0 - Similarity.AdaptiveRecall, Some(501L)))
    val plans = Seq(500L, 2000L, 100000L)
      .map(n => HyperplaneBands.bandPlan(0.9, 1e-4, Some(n)))
    assert(plans.map(_._1) == plans.map(_._1).sorted &&
      plans.map(_._1).distinct.size == 3,
      s"scale-mode bits must grow with n: $plans")
    // the auto-planned top-k path: same clustered fixture as the
    // fixed-plan test above; the derived plan must not lose recall
    val rnd = new scala.util.Random(4242)
    def unit(dim: Int): Array[Double] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / nrm)
    }
    val rows = for {
      c <- 0 until 20
      center = unit(64)
      m <- 0 until 6
    } yield {
      val v = center.zip(Array.fill(64)(rnd.nextGaussian() * 0.03))
        .map { case (x, nz) => x + nz }
      (c * 6L + m, v)
    }
    import spark.implicits._
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.HyperplaneBands.register(spark)
    val exact = Similarity.knnJoinExact(e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val auto = Similarity.knnJoinBlockedAuto(e, 5, tauFloor = 0.9)
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == exact, "auto-planned kNN lost a true neighbor")
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    spark.catalog.clearCache() // knnJoinBlocked persists its signatures
  }

  test("capped kNN join: no-op when dormant, full-k near-tie results when engaged") {
    // same planted-cluster regime as the blocked spec, denser so the
    // cap actually engages: 8 clusters of 30 (buckets up to 30 > cap 8)
    val rnd = new scala.util.Random(2424)
    def unit(dim: Int): Array[Double] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / nrm)
    }
    val rows = for {
      c <- 0 until 8
      center = unit(64)
      m <- 0 until 30
    } yield {
      val v = center.zip(Array.fill(64)(rnd.nextGaussian() * 0.03))
        .map { case (x, nz) => x + nz }
      (c * 30L + m, v)
    }
    import spark.implicits._
    val e = rows.toDF("vec_id", "v")
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.HyperplaneBands.register(spark)
    // (1) cap ≥ every bucket (30 members max) is PROVABLY a no-op —
    // byte-identical result to the uncapped path (this is the dormancy
    // argument that lets sim6 share sim5's exact oracle at gate scale)
    val uncapped = Similarity.knnJoinBlocked(e, 5, bits = 10, bands = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dormant = Similarity.knnJoinBlocked(e, 5, bits = 10, bands = 60,
        bucketCap = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dormant == uncapped, "dormant cap changed the result")
    // (2) engaged cap (8 ≪ 30-member buckets): every row still gets a
    // FULL top-5, and every returned neighbor is a genuine near-tie
    // (a cluster sibling, cos ≥ 0.9 over a ~0 background) — the
    // interchangeability claim the scaladoc makes
    val capped = Similarity.knnJoinBlocked(e, 5, bits = 10, bands = 60,
      bucketCap = 8).collect()
    val perRow = capped.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perRow.size == 240 && perRow.values.forall(_ == 5),
      "engaged cap lost result rows")
    val minCos = capped.map(_.getDouble(3)).min
    assert(minCos >= 0.9, s"engaged cap surfaced a non-neighbor: $minCos")
  }

  test("engaged-cap ANN gate (sim7): cap provably engages and recall holds") {
    // The r9 verdict's residual #1: sim6's cap is dormant at gate
    // scale, so no RECURRING gate covered the engaged regime. sim7's
    // driver gate is a full hash-match oracle of the ENGAGED pipeline;
    // this spec pins the two properties the identity oracle alone
    // can't state: (a) the cap really drops partners on the gate
    // corpus (otherwise sim7 would be dormant too), (b) the capped
    // result keeps high recall vs the exact kNN — the quality
    // contract a 100 TB deployment relies on.
    val e = Similarity.clusteredVecs(spark, sf)
    val sig = Similarity.srpSignatures(spark, e).persist()
    try {
      val buckets = sig.groupBy("band", "sig").count().collect()
      val maxBucket = buckets.map(_.getLong(2)).max
      val over = buckets.count(_.getLong(2) > 4)
      assert(maxBucket > 4,
        s"no (band, sig) bucket exceeds cap 4 — the gate is dormant (max=$maxBucket)")
      assert(over > 50,
        s"cap engages in only $over buckets — engagement is marginal, not structural")
      val engaged = SparkEntry.queries("sim7_knn_engaged")(spark, sf).collect()
      val perRow = engaged.groupBy(_.getLong(0)).view.mapValues(_.length)
      assert(perRow.values.forall(_ == 5), "engaged cap lost result rows")
      val engagedPairs = engaged.map(r => (r.getLong(0), r.getLong(2))).toSet
      val exactPairs = Similarity.knnJoinExact(e, 5).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exactPairs & engagedPairs).size.toDouble / exactPairs.size
      assert(recall >= 0.85, f"engaged recall@5 $recall%.3f below contract 0.85")
      // dropped slots are near-ties, not misses: everything surfaced
      // is a genuine cluster neighbor on this fixture
      val minCos = engaged.map(_.getDouble(3)).min
      assert(minCos >= 0.9, s"engaged cap surfaced a non-neighbor: $minCos")
    } finally sig.unpersist()
  }

  test("fused SRP kernel (graft_srp_bands) matches the explode/join/agg " +
      "formulation signature-for-signature") {
    // srpSignatures moved from the r10 frame shape (posexplode →
    // broadcast-join the flat hyperplane frame → two LONG aggs) to
    // the fused per-row kernel; the md5 sign derivation and the
    // micro-unit floor/round arithmetic must be IDENTICAL, band for
    // band, or the sim7/dd10 oracle contracts silently drift.
    val e = Similarity.clusteredVecs(spark, sf)
    def sigSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = sigSet(Similarity.srpSignatures(spark, e))
    val viaJoin = sigSet(Similarity.srpSignaturesViaJoin(spark, e))
    assert(fused.nonEmpty)
    assert(fused == viaJoin)
  }

  test("adaptive banding (dd10): plan tracks corpus size; recall structural; " +
      "sub-quadratic candidate growth") {
    // (1) plan arithmetic: bits is the smallest b with 2^b·16 ≥ n —
    // integer-exact, monotone in n, and it genuinely moves across the
    // fixture scales this repo gates/benches at (n=501 → 5 bits,
    // n=2001 → 7 bits)
    assert(Similarity.adaptiveBandPlan(501L)._1 == 5)
    assert(Similarity.adaptiveBandPlan(2001L)._1 == 7)
    val bitsByN = Seq(100L, 1000L, 10000L, 100000L, 10000000L)
      .map(Similarity.adaptiveBandPlan(_)._1)
    assert(bitsByN == bitsByN.sorted, s"bits not monotone in n: $bitsByN")
    // the bands table actually delivers the recall bound it promises
    val p = 1.0 - math.acos(Similarity.AdaptiveTau) / math.Pi
    for (b <- Similarity.AdaptiveBitsMin to Similarity.AdaptiveBitsMax) {
      val l = Similarity.adaptiveBands(b)
      val miss = math.pow(1.0 - math.pow(p, b), l)
      assert(miss <= 1.0 - Similarity.AdaptiveRecall + 1e-12,
        s"bands table under-delivers recall at bits=$b: miss=$miss")
    }
    // (2) the planted exact duplicate is found DETERMINISTICALLY
    // (identical vectors share every band signature — recall of the
    // gate pair is structural, not probabilistic), and the plan rides
    // in the output
    val out = SparkEntry.queries("dd10_adaptive_neardup")(spark, sf).collect()
    assert(out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1000000L &&
      r.getDouble(2) == 1.0), s"planted pair missing: ${out.toSeq}")
    assert(out.forall(_.getDouble(2) >= Similarity.AdaptiveTau))
    assert(out.forall(r => r.getLong(3) == 5L),
      "adaptive bits in output should be 5 at n=501")
    // (3) THE scale claim: 4× the corpus must NOT cost ~16× the
    // candidates (what any fixed plan pays once buckets outgrow the
    // corpus — the r9 sf1 finding). Decorrelated replicas (per-replica
    // deterministic sign flips preserve norms but scramble hyperplane
    // sides) model fresh data; the adaptive plan re-splits buckets
    // (5 → 7 bits), holding expected growth to ~n^{1.22} ≈ 5.5×.
    val base = Similarity.plantedVecs(spark, sf)
    val big = (0 until 4).map { r =>
      base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        expr(s"transform(v, (x, i) -> if(pmod(xxhash64($r, i), 2) = 0, x, -x))")
          .as("v"))
    }.reduce(_ unionByName _)
    val (candS, sigS, bitsS, _) = Similarity.adaptiveCandidates(spark, base)
    val (candB, sigB, bitsB, _) = Similarity.adaptiveCandidates(spark, big)
    assert(bitsS == 5 && bitsB == 7, "adaptivity did not engage on the 4x corpus")
    val (cs, cb) =
      try (candS.count(), candB.count())
      finally {
        sigS.unpersist(); sigB.unpersist()
        // the gate closure above also persisted a signature frame
        // inside adaptiveCandidates; Verify/Bench clear it per their
        // cleanup contract — mirror that here so the cached relation
        // doesn't leak into the rest of the suite
        spark.catalog.clearCache()
      }
    val growth = cb.toDouble / cs
    assert(growth < 8.0,
      f"adaptive candidate growth $growth%.1fx for 4x data — not sub-quadratic")
  }

  test("mix1 temperature mix: rare sources upsampled, cap engaged, budget held") {
    val out = SparkEntry.queries("mix1_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("m0", "m1", "m2", "m3", "m4"))
    val byM = out.map(t => t._1 -> t).toMap
    // α=0.5 reweighting: the smallest group's sampling RATE
    // (quota/n_docs) must exceed the largest group's — that's the
    // whole point of temperature mixing
    def rate(m: String) = byM(m)._3.toDouble / byM(m)._2
    assert(rate("m0") > rate("m3"),
      s"rare group not upsampled: ${rate("m0")} vs ${rate("m3")}")
    // m0's fair-share quota exceeds its size → capped at n_docs
    // (sampling without replacement)
    assert(byM("m0")._3 == byM("m0")._2, s"m0 cap not engaged: ${byM("m0")}")
    // quotas respect the global budget (half the corpus)
    val totalDocs = out.map(_._2).sum
    assert(out.map(_._3).sum <= totalDocs / 2 + out.length,
      "quota sum exceeds budget beyond per-group floor slack")
    // rate-threshold selection lands near its quota (binomial around
    // quota; exact equality is not the contract — determinism is, and
    // the DuckDB gate pins the exact selected set)
    out.foreach { case (m, n, q, sel) =>
      assert(sel <= n && math.abs(sel - q) <= math.max(6L, q / 2),
        s"$m selected $sel far from quota $q")
    }
  }

  test("txt10 LM scoring: plain-Scala LM recomputation, broadcast-join scoring plan") {
    // third independent formulation next to the Spark HOF pipeline
    // and the DuckDB oracle: build the top-K bigram LM and score
    // every doc in plain Scala
    val raw = graft.engine.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bigrams(text: String): Seq[String] = {
      val w = text.trim.split("\\s+", -1)
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => s"${p(0)} ${p(1)}").toSeq
    }
    val counts = raw.values.toSeq.flatMap(bigrams)
      .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val prefix = counts.toSeq
      .groupBy(_._1.split(" ", 2)(0))
      .map { case (w1, gs) => w1 -> gs.map(_._2).sum }
    val lm: Map[String, Long] = counts.toSeq
      .sortBy { case (g, n) => (-n, g) }.take(256)
      .map { case (g, n) => g -> prefix(g.split(" ", 2)(0)) / n }.toMap
    val expect = raw.map { case (id, text) =>
      val gs = bigrams(text)
      val inLm = gs.count(lm.contains)
      val sup = gs.map(g => lm.getOrElse(g, 100L)).sum
      id -> ((gs.length.toLong, inLm.toLong, sup))
    }
    val df = SparkEntry.queries("txt10_lm_score")(spark, sf)
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // plan shape: the corpus streams through a BroadcastHashJoin
    // against the bounded LM (it never shuffles to be scored), and
    // the per-doc rollup splits partial/final so its one exchange
    // carries per-doc partials, not per-gram rows
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"LM lookup is not a broadcast join:\n$plan")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length == 1,
      s"expected exactly one doc_id exchange (the partial-agg'd " +
        s"rollup):\n$plan")
    assert("HashAggregate\\(keys=\\[doc_id".r.findAllIn(plan).length == 2,
      s"per-doc rollup lost its partial/final split:\n$plan")
  }

  test("txt11 key terms: plain-Scala TF-IDF recomputation, top-k plan shape") {
    // third independent formulation next to the Spark pipeline and
    // the DuckDB oracle: recompute every doc's integer TF-IDF top-3
    val raw = graft.engine.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def terms(text: String): Seq[String] =
      text.trim.split("\\s+", -1).toSeq.filter(_.length >= 4)
    val tf: Map[Long, Map[String, Long]] = raw.map { case (id, text) =>
      id -> terms(text).groupBy(identity)
        .map { case (t, o) => t -> o.size.toLong }
    }
    val df: Map[String, Long] = tf.values.toSeq.flatMap(_.keys)
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = raw.size.toLong
    def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expect = tf.collect { case (id, m) if m.nonEmpty =>
      val ranked = m.toSeq
        .map { case (t, f) => (t, f * bitLen(n / df(t))) }
        .sortBy { case (t, s) => (-s, t) }.take(3)
      id -> ((ranked.map(_._1).padTo(3, null).toList, ranked.head._2))
    }
    val got = SparkEntry.queries("txt11_keyterms")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((List(r.getString(1), r.getString(2), r.getString(3)),
          r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // plan shape: rank<=3 compiles to WindowGroupLimit (tasks truncate
    // to local top-3 per doc before the one doc_id exchange), the df
    // model broadcasts back onto persisted tf, and the corpus parquet
    // is scanned ONCE (tf persisted for its two consumers)
    val q = SparkEntry.queries("txt11_keyterms")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("WindowGroupLimit"),
      s"top-3 filter did not compile to WindowGroupLimit:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"df model is not a broadcast join:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length <= 1,
      s"corpus scanned more than once — tf persist lost:\n$plan")
    spark.catalog.clearCache()
  }

  test("shuf1 global shuffle: exact permutation, shard-local ranks, one shuffle") {
    val df = SparkEntry.queries("shuf1_global_shuffle")(spark, sf)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.engine.Tables.load(spark, sf, "documents").count()
    // a PERMUTATION: every doc exactly once, no (shard,pos) collisions
    assert(out.length.toLong == nDocs)
    assert(out.map(_._3).distinct.length.toLong == nDocs, "doc repeated/lost")
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length,
      "(shard,pos) slot collision")
    // shard-local ranks are contiguous 1..n_shard — a loader can read
    // shard s sequentially with no gaps, which is what makes the
    // per-shard sort (instead of one global ORDER BY) semantically
    // equivalent to a full shuffle at the consumer
    out.groupBy(_._1).foreach { case (s, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong &&
        ps.length == ps.distinct.length, s"shard $s ranks not 1..n: gaps")
    }
    // deterministic: a second evaluation is bit-identical
    val again = SparkEntry.queries("shuf1_global_shuffle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet, "shuffle not deterministic")
    // it actually shuffles: md5 decorrelates order from doc_id (the
    // natural input order) — Spearman-style check that doc order
    // within a shard is not monotone in doc_id
    val monotoneShards = out.groupBy(_._1).count { case (_, rows) =>
      val ids = rows.sortBy(_._2).map(_._3)
      ids.sameElements(ids.sorted)
    }
    assert(monotoneShards == 0, s"$monotoneShards shards kept input order")
    // plan: exactly ONE exchange (hash by shard) and NO global sort —
    // the sort must be partition-local under the window
    // AQE's toString echoes the initial plan below the final one —
    // audit the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global range sort crept into the shuffle plan:\n$plan")
    // the shard count is corpus-count-adaptive (integer-ceil with a
    // floor): flat at gate scales, engaged at the sf1 corpus and
    // beyond — holding per-shard sort cost constant as data grows
    assert(TextAnalysis.shuffleShards(500L) == 16L)
    assert(TextAnalysis.shuffleShards(5000L) == 16L)
    assert(TextAnalysis.shuffleShards(50000L) == 25L)
    assert(TextAnalysis.shuffleShards(1000000000L) == 500000L)
  }

  test("txt8 chunking: independent recomputation of windows and checksums") {
    // recompute n_chunks and the chunk-hash sum in plain Scala from
    // the raw text for every doc — an in-JVM third formulation next
    // to the Spark HOF pipeline and the DuckDB oracle
    val out = SparkEntry.queries("txt8_chunk_overlap")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val raw = graft.engine.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == raw.keySet)
    val md = java.security.MessageDigest.getInstance("MD5")
    def chunkSum(text: String): (Long, Long, Long) = {
      val words = text.trim.split("\\s+", -1) // split keeps [""] for empty
      val n = words.length.toLong
      val nc = 1 + (math.max(n - 64, 0) + 47) / 48
      val s = (0L until nc).map { i =>
        val chunk = words.slice((i * 48).toInt,
          math.min(i * 48 + 64, n).toInt).mkString(" ")
        val hex = md.digest(chunk.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16)
      }.sum
      (n, nc, s)
    }
    raw.foreach { case (id, text) =>
      assert(out(id) == chunkSum(text), s"doc $id chunk mismatch")
    }
    // geometry sanity: every multi-chunk doc overlaps its windows by
    // 16 tokens (64-token windows at stride 48)
    val multi = out.values.count(_._2 > 1)
    assert(multi > 0, "fixture has no multi-chunk doc — overlap untested")
  }

  test("txt9 quality cutoff: P75 keeps ~top quartile; micro-unit score dodges round ties") {
    val out = SparkEntry.queries("txt9_quality_cutoff")(spark, sf).collect()
    val counts = Tables.load(spark, sf, "documents")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == counts.keySet)
    // a P75 cutoff keeps the top quartile plus boundary ties
    out.foreach { r =>
      val frac = r.getLong(2).toDouble / counts(r.getString(0))
      assert(frac >= 0.2 && frac <= 0.55,
        s"${r.getString(0)} kept fraction $frac outside the P75 band")
    }
    // the hazard the micro-unit floor-form dodges: a diversity score
    // of 1/128 is EXACTLY 7812.5 micro-units — an exact decimal half,
    // the repo-wide round()-tie class (ADVICE r4, emb1's caveat)
    // where engines' HALF semantics are allowed to differ by type and
    // version; floor(x·1e6 + 0.5) resolves the tie with plain IEEE
    // arithmetic that is identical everywhere, so the question never
    // reaches round()
    val hazard = spark.sql(
      "SELECT cast(floor(1.0 * 1e6 / 128.0 + 0.5) as bigint) v")
      .head().getLong(0)
    assert(hazard == 7813L)
  }

  test("hyperplane band signatures: codegen equals interpreted eval") {
    import graft.functions.HyperplaneBands
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    HyperplaneBands.register(spark)
    // codegen'd path through SQL
    val sql = spark.sql(
      "SELECT graft_hyperplane_bands(array(0.3D, -1.2D, 0.7D, 2.5D), 4, 8, 42) AS s")
      .head().getSeq[Long](0)
    // interpreted eval on the bare expression
    val e = graft.functions.HyperplaneBands(
      BoundReference(0, ArrayType(DoubleType), nullable = false), 4, 8, 42L)
    val interp = e.eval(InternalRow(new GenericArrayData(
      Array(0.3, -1.2, 0.7, 2.5)))).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(sql == interp)
    assert(sql.length == 8)
    assert(sql.forall(s => s >= 0 && s < 16)) // 4-bit signatures
  }

  test("hyperplane band params trade selectivity for band count") {
    import graft.functions.HyperplaneBands.params
    val (bLow, lLow) = params(0.4, 1e-4)
    val (bHigh, lHigh) = params(0.9, 1e-4)
    // more selective threshold affords more bits per band (better pruning)
    assert(bHigh > bLow)
    assert(lLow <= 64 && lHigh <= 64 && lLow >= 1 && lHigh >= 1)
    // the miss bound actually holds for the returned params
    def miss(tau: Double, b: Int, l: Int): Double = {
      val p = 1.0 - math.acos(tau) / math.Pi
      math.pow(1.0 - math.pow(p, b), l)
    }
    assert(miss(0.4, bLow, lLow) <= 1e-4)
    assert(miss(0.9, bHigh, lHigh) <= 1e-4)
  }

  test("graft_hyperplane_bands raises on null elements") {
    graft.functions.HyperplaneBands.register(spark)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_hyperplane_bands(array(1.0D, cast(null as double)), 4, 8, 42) AS s")
        .head()
    }
    assert(err.getMessage.contains("null array element")
      || Option(err.getCause).exists(_.getMessage.contains("null array element")))
  }

  test("graft_cosine raises on length mismatch and null elements") {
    graft.functions.CosineSimilarity.register(spark)
    val mismatch = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0D, 2.0D), array(1.0D)) AS c")
        .head()
    }
    assert(mismatch.getMessage.contains("length mismatch")
      || Option(mismatch.getCause).exists(_.getMessage.contains("length mismatch")))
    val nullElem = intercept[Exception] {
      spark.sql(
        "SELECT graft_cosine(array(1.0D, cast(null as double)), array(1.0D, 2.0D)) AS c")
        .head()
    }
    assert(nullElem.getMessage.contains("null array element")
      || Option(nullElem.getCause).exists(_.getMessage.contains("null array element")))
  }

  test("native graft_cosine matches the composable HOF formulation") {
    graft.functions.CosineSimilarity.register(spark)
    val both = Tables.load(spark, sf, "embeddings").limit(50)
      .select(
        expr("graft_cosine(embedding, embedding)").as("self"),
        (expr("aggregate(zip_with(transform(embedding, x -> cast(x as double)), " +
          "transform(embedding, x -> cast(x as double)), (x, y) -> x * y), 0D, (a, x) -> a + x)") /
          (sqrt(expr("aggregate(transform(embedding, x -> cast(x as double)), 0D, (a, x) -> a + x * x)")) *
            sqrt(expr("aggregate(transform(embedding, x -> cast(x as double)), 0D, (a, x) -> a + x * x)"))))
          .as("hof"))
      .collect()
    both.foreach { r => assert(r.getDouble(0) == r.getDouble(1)) } // bit-identical
    both.foreach { r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12) }
  }

  test("graft_cosine resolves in SQL and rejects bad arity/types") {
    graft.functions.CosineSimilarity.register(spark)
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
      .head().getDouble(0)
    assert(v == 0.0)
    val v2 = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(v2 - 1.0) < 1e-12)
    // extensions entry point constructs the same injection without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.engine.GraftExtensions().apply(ext)
  }

  test("lang-id partitions all docs") {
    val total = Tables.load(spark, sf, "documents").count()
    val byLang = SparkEntry.queries("txt2_lang_id")(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(byLang == total)
  }

  test("multimodal decode conserves byte counts through mapPartitions") {
    val expected = Tables.load(spark, sf, "documents")
      .agg(sum(octet_length(col("text")))).head().getLong(0)
    val got = Multimodal.mediaFeatures(spark, sf)
      .toDF().agg(sum(col("n_bytes"))).head().getLong(0)
    assert(got == expected)
    // byte-stats fallback is deterministic: same input -> same features
    val a = Multimodal.mediaFeatures(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.mediaFeatures(spark, sf).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    // non-decodable mimes report no raster dimensions (honest contract)
    assert(a.forall(f => f.width == 0 && f.height == 0))
  }

  test("PNG path is a real imageio round-trip: decoded dims + per-pixel " +
    "gradient match the generator contract (mm3)") {
    val feats = SparkEntry.queries("mm3_png_decode")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8 + (id % 25).toInt, s"width of doc $id")
      assert(r.getInt(2) == 8 + ((id * 7) % 25).toInt, s"height of doc $id")
      // the gradient total — content-exact over a raster whose every
      // pixel differs (a constant fill would hide a decoder that only
      // got the average right)
      assert(r.getLong(3) == Multimodal.gradientPxSum(id),
        s"gradient pixel sum of doc $id")
    }
    // the blobs are genuine PNGs (magic bytes), not fabricated
    val blob = Multimodal.pngRecords(spark, sf).head()
    assert(blob.content.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("PNG resize samples the declared nearest-neighbor source pixels " +
    "through the codec (mm4)") {
    val feats = SparkEntry.queries("mm4_png_resize")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 16 && r.getInt(2) == 12)
      assert(r.getLong(3) == Multimodal.gradientResizedPxSum(id, 16, 12),
        s"resized gradient pixel sum of doc $id")
    }
  }

  test("uniform gray survives the lossy JPEG codec exactly — the " +
    "property the mm5 oracle's closed form rests on") {
    // all 256 gray values at the gate quality, over the fixture's
    // geometry extremes plus non-block-aligned shapes (subsampled
    // chroma padding, partial DCT blocks)
    for (v <- 0 until 256; (w, h) <- Seq((8, 8), (32, 32), (17, 13)))
      assert(Multimodal.jpegGrayRoundTripExact(v, w, h),
        s"gray $v at ${w}x$h did not round-trip exactly")
    // and the property is about GRAY, not about JPEG being lossless:
    // a saturated-chroma fill must NOT round-trip bit-exactly at the
    // same quality (if it did, the gray restriction — and the whole
    // closed-form-oracle argument — would be vacuous)
    val codecProbe = Multimodal.mixedRecords(spark, sf)
    val jpeg = codecProbe.filter(_.mime == "image/jpeg").head()
    assert(jpeg.content.take(2).toSeq ==
      Seq(0xFF.toByte, 0xD8.toByte), "JPEG magic bytes missing") // SOI
  }

  test("mixed PNG/JPEG decode dispatches per mime and matches the " +
    "closed-form fills (mm5)") {
    val feats = SparkEntry.queries("mm5_mixed_decode")(spark, sf).collect()
    assert(feats.nonEmpty)
    assert(feats.exists(_.getString(1) == "image/png") &&
      feats.exists(_.getString(1) == "image/jpeg"), "not a mixed corpus")
    feats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 25).toInt, (8 + (id * 7) % 25).toInt)
      assert(r.getInt(2) == w && r.getInt(3) == h, s"dims of $id")
      if (id % 2 == 0) {
        assert(r.getString(1) == "image/png")
        assert(r.getLong(4) == Multimodal.gradientPxSum(id),
          s"png gradient px_sum of $id")
      } else {
        assert(r.getString(1) == "image/jpeg")
        assert(r.getLong(4) == w.toLong * h * 3 * (id % 256),
          s"jpeg px_sum of $id — the lossy round-trip drifted")
      }
    }
  }

  test("mixed resize preserves each blob's mime and the closed-form " +
    "content through the full lossy round-trip (mm6)") {
    val feats = SparkEntry.queries("mm6_mixed_resize")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == 16 && r.getInt(3) == 12, s"dims of $id")
      if (id % 2 == 0) {
        assert(r.getString(1) == "image/png")
        assert(r.getLong(4) == Multimodal.gradientResizedPxSum(id, 16, 12),
          s"png resized gradient px_sum of $id")
      } else {
        assert(r.getString(1) == "image/jpeg")
        assert(r.getLong(4) == 16L * 12 * 3 * (id % 256),
          s"jpeg resize round-trip drifted for $id")
      }
    }
    // mime preservation is structural, not just labeled, asserted on
    // the POST-resize records (r16 advice #2: checking the pre-resize
    // ingest fixture could not detect a silent transcode in the
    // resize stage): resized JPEG blobs still carry JPEG SOI magic,
    // resized PNG blobs the PNG signature
    val resized = graft.pipeline.Multimodal
      .mixedResizedRecords(spark, sf).collect()
    assert(resized.nonEmpty)
    resized.foreach { rec =>
      if (rec.media_id % 2 == 1)
        assert(rec.content.take(2).toSeq ==
          Seq(0xFF.toByte, 0xD8.toByte), s"JPEG ${rec.media_id} transcoded")
      else
        assert(rec.content.take(4).toSeq ==
          Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
          s"PNG ${rec.media_id} transcoded")
    }
  }

  test("WAV path is a real RIFF round-trip: parsed format, sample " +
    "count and amplitude sum match the waveform contract (mm7)") {
    val feats = SparkEntry.queries("mm7_wav_decode")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 64 + id % 192, s"sample count of $id")
      assert(r.getInt(2) == Multimodal.WavSampleRate, s"rate of $id")
      assert(r.getLong(3) == Multimodal.wavAmpSum(id), s"amp sum of $id")
    }
    // the blobs are genuine RIFF/WAVE containers, not fabricated
    val blob = Multimodal.wavRecords(spark, sf).head()
    assert(blob.content.take(4).toSeq == "RIFF".getBytes.toSeq)
    assert(blob.content.slice(8, 12).toSeq == "WAVE".getBytes.toSeq)
    assert(blob.mime == "audio/wav")
  }

  test("video containers hold real length-prefixed PNG frames; sampling slices the right ones") {
    // every video is 4 length-prefixed frames; the sampler extracts
    // original indices 0 and 2 WITHOUT decoding the others, and each
    // sampled slice is a genuine PNG (magic bytes + imageio decode)
    val videos = Multimodal.videoRecords(spark, sf).head(3)
    videos.foreach { v =>
      val bb = java.nio.ByteBuffer.wrap(v.content)
      var n = 0
      while (bb.remaining() > 0) {
        val len = bb.getInt()
        assert(len > 0 && len <= bb.remaining(), "frame boundary corrupt")
        assert(v.content(bb.position()) == 0x89.toByte &&
          v.content(bb.position() + 1) == 'P'.toByte, "frame is not a PNG")
        bb.position(bb.position() + len)
        n += 1
      }
      assert(n == 4, s"expected 4 frames, found $n")
    }
    val frames = Multimodal.mediaFrames(spark, sf).collect()
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.values.forall(_.map(_.frame_idx).sorted.toSeq == Seq(0, 2)))
    // decoded stats match the closed-form frame contract
    val feats = SparkEntry.queries("mm2_frame_stats")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val (id, f) = (r.getLong(0), r.getInt(1))
      assert(r.getInt(2) == (6 + (id + 3L * f) % 12).toInt, s"width of ($id,$f)")
      assert(r.getInt(3) == (6 + (7L * id + 5L * f) % 12).toInt, s"height of ($id,$f)")
      val px = ((id + f) % 256) + ((31L * id + 7L * f) % 256) + ((101L * id + 13L * f) % 256)
      assert(r.getLong(4) == r.getInt(2).toLong * r.getInt(3) * px, s"px_sum of ($id,$f)")
    }
  }

  test("dd9 boilerplate removal matches an in-memory recomputation") {
    // recompute the whole pipeline in plain Scala: 4-word segments,
    // df >= 3 boilerplate set, ordered reassembly — then compare the
    // per-source counting columns (the hash column is the driver
    // oracle's job; here we pin the semantics independently)
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def segsOf(text: String): Seq[String] =
      text.trim.split("\\s+").grouped(4).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, _, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val boiler = df.collect { case (s, n) if n >= 3 => s }.toSet
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val cleanedSegs = ds.map { case (_, _, t) => segsOf(t).filterNot(boiler) }
      val removed = ds.map { case (_, _, t) => segsOf(t).count(boiler) }
      (src, ds.length.toLong, removed.map(_.toLong).sum,
        removed.count(_ > 0).toLong,
        cleanedSegs.map(_.mkString(" ").length.toLong).sum)
    }
    val got = SparkEntry.queries("dd9_boilerplate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).toSet
    assert(got.exists(_._3 > 0), "gate must bite: some boilerplate removed")
    assert(got == expected.toSet)
  }

  test("dd9 plan: boilerplate set broadcasts; no cartesian product") {
    // the gate materializes eagerly (persist/release of the segment
    // stream); audit the schema-identical lazy plan instead
    val plan = Dedup.lazyShapes("dd9_boilerplate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the removal pass must be a map-side broadcast join — the
    // boilerplate set is the heavy-hitter tail, never corpus-sized
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("exact dedup counts unique within source") {
    val rows = SparkEntry.queries("dd1_exact_dedup")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("io2 CSV dialect round-trips adversarial strings (ScalaCheck property)") {
    import org.scalacheck.Gen
    import graft.pipeline.CorpusIO
    // the dialect's hazard surface: quotes, embedded newlines/CRLF,
    // delimiters, leading/trailing whitespace, unicode, empty string,
    // and strings equal to the null/empty sentinels themselves
    val nasty = Gen.oneOf("\"", "\"\"", "a\"b", "line1\nline2", "a\r\nb",
      ",", "a,b,", " lead", "trail ", "  ", "", "\\N", "\\\\N", "N",
      "\\n", "héllo wörld", "emoji 😀", "quote\"and\nnewline,x")
    val anyStr = Gen.frequency(
      5 -> nasty,
      3 -> Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', ',', '\n',
        '\r', ' ', '\\', 'ß', '中'))).map(_.mkString),
      1 -> Gen.const(null: String))
    val genRows = Gen.listOfN(40, anyStr)
    import spark.implicits._
    (0 until 8).foreach { trial =>
      val strs = genRows(Gen.Parameters.default,
        org.scalacheck.rng.Seed(20260813L + trial)).getOrElse(Nil)
      // always exercise the sentinel cases alongside the random draw
      val rows = (strs ++ Seq(null, "", "\\N")).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft_csv_prop")
      try {
        df.write.mode("overwrite").options(CorpusIO.csvDialect).csv(dir.toString)
        val back = spark.read.schema(df.schema).options(CorpusIO.csvDialect)
          .option("multiLine", "true").csv(dir.toString)
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) null else r.getString(1))).toMap
        rows.foreach { case (id, s) =>
          assert(back.contains(id), s"trial $trial: row $id lost")
          // the dialect's one reserved token: a data string equal to
          // the null sentinel parses back as NULL (documented contract
          // limit of sentinel-based CSV null encoding)
          val expected = if (s == "\\N") null else s
          assert(back(id) == expected,
            s"trial $trial row $id: wrote ${render(s)}, read ${render(back(id))}")
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir.toFile)
      }
    }
  }

  private def render(s: String): String =
    if (s == null) "<null>" else "\"" + s.flatMap {
      case '\n' => "\\n"; case '\r' => "\\r"; case c => c.toString
    } + "\""

  test("composed clean-corpus pipeline: dedup never inflates quality counts") {
    val quality = SparkEntry.queries("txt3_quality")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // source -> n_quality
    val piped = SparkEntry.queries("pipe1_clean_corpus")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(piped.nonEmpty)
    piped.foreach { case (source, nKept, tok, chars) =>
      // kept docs = quality docs minus duplicates, never more
      assert(nKept <= quality.getOrElse(source, 0L), source)
      assert(nKept > 0 && tok > 0 && chars > 0, source)
      // quality gate bounds tokens per doc to [50, 1000]
      assert(tok >= 50L * nKept && tok <= 1000L * nKept, source)
    }
  }
}
