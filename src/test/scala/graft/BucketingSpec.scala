package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.planopt.Candidates

/** The bucketing contract behind SCALE.md's co-located-join story: two
  * tables bucketed (and sorted) on their join key join WITHOUT any
  * exchange under the join — at 100 TB that is the difference between
  * a full-corpus shuffle per join and none. Spec-proven here rather
  * than asserted in prose: the join subtree must contain zero
  * ShuffleExchange nodes, and the bucketed result must equal the
  * plain-table result.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def deleteRecursively(path: String): Unit =
    graft.pipeline.CorpusIO.deleteRec(new java.io.File(path))

  test("bucketed co-located join: no exchange under the join, same result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val li = s"li_bucketed_${System.nanoTime()}"
    val or = s"or_bucketed_${System.nanoTime()}"
    try {
      Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.format("parquet").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$dir/li").saveAsTable(li)
      Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$dir/or").saveAsTable(or)

      // broadcast off + AQE off: without bucketing this join would
      // shuffle BOTH sides on the key
      Candidates.withConfs(spark, Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.sources.bucketing.enabled" -> "true")) {
        val j = spark.table(li).join(spark.table(or),
          col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("l_quantity")).cast("double").as("qty"))
        val plan = j.queryExecution.executedPlan
        val smj = plan.collect { case s: SortMergeJoinExec => s }
        assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
        // the whole point: nothing shuffles BELOW the join — bucket
        // layout satisfies the join's distribution requirement
        val exchangesUnderJoin = smj.head.collect { case e: ShuffleExchangeExec => e }
        assert(exchangesUnderJoin.isEmpty,
          s"bucketed join still shuffles:\n${smj.head}")
        // and bucket sort order even removes the per-task sorts' input
        // exchange; correctness vs the plain-table join:
        val bucketed = j.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val plain = Tables.load(spark, sf, "lineitem")
          .join(Tables.load(spark, sf, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("l_quantity")).cast("double").as("qty"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(bucketed == plain)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $li")
      spark.sql(s"DROP TABLE IF EXISTS $or")
      deleteRecursively(dir)
    }
  }

  test("io5 gate joins bucket-to-bucket: no exchange feeds the join") {
    // pin the CACHED (corpus-keyed persisted layout) path — the one
    // the gate actually runs; a second call must reuse the layout
    // (catalog-only registration) and still plan zero join exchanges
    Candidates.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")) {
      val j = graft.pipeline.CorpusIO.bucketedJoinCached(spark, sf)
      val plan = j.queryExecution.executedPlan
      val smj = plan.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      val exchangesUnderJoin = smj.head.collect { case e: ShuffleExchangeExec => e }
      assert(exchangesUnderJoin.isEmpty,
        s"io5 bucketed join still shuffles:\n${smj.head}")
      assert(j.count() > 0)
      // warm path: layout exists → second build is catalog-only and
      // identical in plan shape
      val j2 = graft.pipeline.CorpusIO.bucketedJoinCached(spark, sf)
      val smj2 = j2.queryExecution.executedPlan
        .collect { case s: SortMergeJoinExec => s }
      assert(smj2.nonEmpty &&
        smj2.head.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "cached-layout reuse lost the zero-exchange property")
    }
  }

  test("partition-pruned scan touches only the matching partition's files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      Tables.load(spark, sf, "documents")
        .write.format("parquet").partitionBy("lang").save(s"$dir/docs")

      def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
        df.collect() // run so the scan's numFiles metric is populated
        df.queryExecution.executedPlan
          .collect { case s: FileSourceScanExec => s }.head
      }
      val all = scanOf(spark.read.parquet(s"$dir/docs"))
      val pruned = scanOf(spark.read.parquet(s"$dir/docs")
        .filter(col("lang") === "en"))
      // the partition predicate must show up as a partition filter (not
      // a data filter) and cut the files actually listed for the scan
      assert(pruned.partitionFilters.nonEmpty,
        "lang = 'en' did not become a partition filter")
      val filesAll = all.metrics("numFiles").value
      val filesPruned = pruned.metrics("numFiles").value
      assert(filesPruned > 0 && filesPruned < filesAll,
        s"no pruning: $filesPruned of $filesAll files")
    } finally deleteRecursively(dir)
  }

  test("io6 fact scan is pruned by a DYNAMIC (join-derived) partition filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    try {
      graft.pipeline.CorpusIO.writeDppFact(spark, sf, dir)
      val df = graft.pipeline.CorpusIO.dppJoin(spark, sf, dir)
      df.collect() // run so the scan's partition metrics are populated
      // collect across AQE shells and materialized query stages
      // (QueryStageExec is a leaf to TreeNode.collect)
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
      // column pruning leaves only (c_acctbal, c_nationkey) on the
      // fact scan — identify it by its partition column
      val scan = scans(df.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "c_nationkey")).head
      // the pruning predicate on c_nationkey only exists at RUNTIME
      // (it is the filtered dim's key set), so it must surface as a
      // DynamicPruningExpression partition filter, not a data filter
      assert(scan.partitionFilters.exists(
        _.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruning]).isDefined),
        s"no dynamic pruning filter on the fact scan:\n$scan")
      // partitions actually read must equal the dirs whose nation is
      // in region 0 AND present in customer — strictly fewer than the
      // total layout dirs
      val expected = Tables.load(spark, sf, "customer")
        .join(Tables.load(spark, sf, "nation")
          .filter(col("n_regionkey") === 0),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_nationkey")).distinct().count()
      val total = Tables.load(spark, sf, "customer")
        .select(col("c_nationkey")).distinct().count()
      val read = scan.metrics("numPartitions").value
      assert(read == expected && read < total,
        s"expected $expected of $total partitions read, got $read")
    } finally deleteRecursively(dir)
  }

  test("io10 range layout: disjoint per-file time slices prune a range scan") {
    import graft.pipeline.CorpusIO
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    try {
      CorpusIO.rangeLayoutWrite(spark, sf, dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      assert(files.length == CorpusIO.RangeFiles,
        s"expected ${CorpusIO.RangeFiles} range files, got ${files.length}")
      // each file owns a DISJOINT [min(ts), max(ts)] slice at exact
      // micros precision — the property parquet min/max stats prune on
      val byFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
          .head()
        (f, r.getLong(0), r.getLong(1))
      }.sortBy(_._2)
      byFile.sliding(2).foreach {
        case Array((_, _, aMax), (_, bMin, _)) =>
          assert(aMax < bMin, s"overlapping slices: $aMax >= $bMin")
        case _ => ()
      }
      // a one-slice predicate intersects exactly ONE file, and reading
      // only that file reproduces the full filtered result — the
      // manual form of the min/max pruning a parquet reader applies
      val (sFile, sMin, sMax) = byFile(3)
      val touching = byFile.count { case (_, a, b) => a <= sMax && b >= sMin }
      assert(touching == 1, s"slice 3 predicate touches $touching files")
      def filteredRollup(paths: String*) =
        spark.read.parquet(paths: _*)
          .filter(unix_micros(col("ts")).between(sMin, sMax))
          .agg(count(lit(1)), sum(col("event_id"))).head()
      assert(filteredRollup(dir) == filteredRollup(sFile),
        "single-slice read diverges from the full filtered scan")
    } finally deleteRecursively(dir)
  }

  test("io11 z-order layout: per-file 2-D rectangles prune BOTH dimensions") {
    import graft.pipeline.CorpusIO
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft_range2").toString
    try {
      CorpusIO.zorderLayoutWrite(spark, sf, zDir)
      CorpusIO.rangeLayoutWrite(spark, sf, rDir)
      def parquetFiles(d: String) = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      val zFiles = parquetFiles(zDir)
      assert(zFiles.length == CorpusIO.ZFiles,
        s"expected ${CorpusIO.ZFiles} z files, got ${zFiles.length}")
      // global dimension ranges (what a metastore would hold)
      val g = Tables.load(spark, sf, "events").agg(
        min(col("user_id")), max(col("user_id")),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val (uMin, uMax, tMin, tMax) =
        (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
      // quadrant predicate: u-buckets 4..7 x t-buckets 8..11 of the
      // 16x16 morton grid, expressed as closed ranges via the same
      // floor-bucket arithmetic the layout used
      def lo(b: Long, dMin: Long, dMax: Long) =
        dMin + (b * (dMax - dMin + 1) + 15) / 16
      def hi(b: Long, dMin: Long, dMax: Long) =
        lo(b + 1, dMin, dMax) - 1
      val (uLo, uHi) = (lo(4, uMin, uMax), hi(7, uMin, uMax))
      val (tLo, tHi) = (lo(8, tMin, tMax), hi(11, tMin, tMax))
      // per-file min/max rectangle on BOTH dims — what parquet
      // file-level stats expose to a pruning reader
      def rects(files: Array[String]) = files.map { f =>
        val r = spark.read.parquet(f).agg(
          min(col("user_id")), max(col("user_id")),
          min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
        (f, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
      val zRects = rects(zFiles)
      val touching2d = zRects.filter { case (_, a, b, c, d) =>
        a <= uHi && b >= uLo && c <= tHi && d >= tLo }
      assert(touching2d.nonEmpty && touching2d.length <= 4,
        s"2-D quadrant predicate touches ${touching2d.length} of " +
          s"${zFiles.length} z files (expected <=4)")
      // a USER-only predicate still prunes under z-order...
      val touchingU = zRects.count { case (_, a, b, _, _) =>
        a <= uHi && b >= uLo }
      assert(touchingU < zFiles.length,
        s"user predicate touches all $touchingU z files")
      // ...but touches EVERY file of the 1-D time-range layout —
      // the comparison that motivates multi-dimensional clustering
      val rTouchingU = rects(parquetFiles(rDir)).count {
        case (_, a, b, _, _) => a <= uHi && b >= uLo }
      assert(rTouchingU == CorpusIO.RangeFiles,
        s"time-range layout unexpectedly pruned a user predicate " +
          s"($rTouchingU of ${CorpusIO.RangeFiles})")
      // manual pruning is result-exact: reading only the touching
      // files under the 2-D filter equals the full-directory scan
      def rollup(paths: String*) = spark.read.parquet(paths: _*)
        .filter(col("user_id").between(uLo, uHi) &&
          unix_micros(col("ts")).between(tLo, tHi))
        .agg(count(lit(1)), sum(col("event_id"))).head()
      assert(rollup(zDir) == rollup(touching2d.map(_._1).toSeq: _*),
        "pruned z-file read diverges from the full filtered scan")
    } finally {
      deleteRecursively(zDir)
      deleteRecursively(rDir)
    }
  }

  test("io12 bloom skipping: no false negatives, beats min/max on scattered keys") {
    import graft.pipeline.CorpusIO
    import graft.functions.BloomSketch
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    try {
      CorpusIO.bloomLayoutWrite(spark, sf, dir)
      val index = CorpusIO.bloomIndex(spark, dir)
      assert(index.length > 1 && index.length <= CorpusIO.BloomFiles,
        s"expected 2..${CorpusIO.BloomFiles} indexed files, got ${index.length}")
      // ground truth: each doc's fingerprint and the file that holds it
      val truth = spark.read.parquet(dir)
        .select(col("_metadata.file_path").as("file"),
          xxhash64(md5(col("text").cast("binary"))).as("fp"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val byFile = index.toMap
      // NO FALSE NEGATIVES — the exactness contract file skipping
      // rests on: every doc's own file must answer "maybe"
      truth.foreach { case (f, fp) =>
        assert(BloomSketch.mightContain(byFile(f), fp, CorpusIO.BloomK),
          s"false negative: fingerprint $fp invisible in its own file")
      }
      // absent keys (synthetic, verified disjoint from the corpus)
      val corpusFps = truth.map(_._2).toSet
      val absent = (0 until 200).map(i => XXH64.hashLong(i, 9999L))
        .filterNot(corpusFps)
      // per-file fingerprint min/max — what io10-style stats pruning
      // would have to use on this (unclustered) dimension
      val ranges = spark.read.parquet(dir)
        .groupBy(col("_metadata.file_path"))
        .agg(min(xxhash64(md5(col("text").cast("binary")))),
          max(xxhash64(md5(col("text").cast("binary")))))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val bloomTouched = absent.map(fp => index.count { case (_, bm) =>
        BloomSketch.mightContain(bm, fp, CorpusIO.BloomK) }).sum
      val rangeTouched = absent.map(fp => ranges.count { case (lo, hi) =>
        lo <= fp && fp <= hi }).sum
      // SKIPPING ENGAGES where min/max cannot: bloom selects (near)
      // zero files for absent probes; fingerprints scatter, so min/max
      // ranges still admit a large share of them
      assert(bloomTouched <= absent.length / 20,
        s"bloom admitted $bloomTouched file-probes over ${absent.length} " +
          "absent keys (FPR far above the sized bound)")
      assert(bloomTouched < rangeTouched,
        s"bloom ($bloomTouched) did not beat min/max ($rangeTouched)")
      // PRUNED READ IS RESULT-EXACT: the gate (bloom-pruned file list)
      // equals the full-table probe rollup
      val gate = SparkEntry.queries("io12_bloom_skipping")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = CorpusIO.lazyShapes("io12_bloom_skipping")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gate == full, "bloom-pruned probe answers diverge from full scan")
      // sanity on the probe mix: present probes matched, absent did not
      assert(gate.exists { case (id, n, _) => id > 0 && n >= 1 })
      assert(gate.forall { case (id, n, d) =>
        (id > 0) == (n >= 1 && d >= 0) && ((id > 0) || (n == 0 && d == -1L)) })
    } finally deleteRecursively(dir)
  }

  test("zBucket stays integer-exact past 2^53 (Column `/` would mis-bucket)") {
    // Spark's Column `/` (Divide) promotes LONG operands to DOUBLE:
    // with span = 2^53 + 1 (rounds to 2^53 as a double) and
    // c·16 = 2^53 exactly, the double formula computes 2^53/2^53 = 1.0
    // → bucket 1, while exact floor((c·16)/span) = 0. zBucket uses SQL
    // DIV (IntegralDivide, LONG in LONG out) — pin the exact answer
    // and pin that the double formula really does diverge here, so
    // this test fails if either the fix or the failure mode changes.
    import graft.pipeline.CorpusIO
    import spark.implicits._
    val lo = 0L
    val hi = 1L << 53 // span = 2^53 + 1
    val c = 1L << 49 // c * 16 = 2^53 = span - 1 → exact bucket 0
    val df = Seq(c).toDF("v")
    val got = df.select(CorpusIO.zBucket("v", lo, hi).as("b"))
      .head().getInt(0)
    assert(got == 0, s"zBucket lost integer exactness: got $got")
    val viaDouble = df.select(
      least(lit(15), ((col("v") - lit(lo)) * 16 / lit(hi - lo + 1))
        .cast("int")).as("b")).head().getInt(0)
    assert(viaDouble == 1,
      "double-division formula no longer diverges — update this pin")
    // and in-range sanity: exact division and the capped top bucket
    val probes = Seq(lo, hi / 16, hi / 2, hi - 1, hi).toDF("v")
    val buckets = probes.select(CorpusIO.zBucket("v", lo, hi).as("b"))
      .collect().map(_.getInt(0)).toSeq
    val expected = probes.as[Long].collect().toSeq
      .map(v => math.min(15L, (BigInt(v - lo) * 16 / BigInt(hi - lo + 1)).toLong).toInt)
    assert(buckets == expected, s"got $buckets, want $expected")
  }

  test("io7 compaction consolidates 64 ingest files into the size-targeted count") {
    import graft.pipeline.CorpusIO
    val smallDir = java.nio.file.Files.createTempDirectory("graft_small").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    def parquetFiles(d: String): Array[java.io.File] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
    try {
      val out = CorpusIO.compactedRead(spark, sf, smallDir, outDir)
      val bytes = parquetFiles(smallDir).map(_.length()).sum
      val expected = math.max(1L,
        (bytes + CorpusIO.compactTargetBytes - 1) / CorpusIO.compactTargetBytes)
      assert(parquetFiles(smallDir).length == 64, "ingest fixture not fragmented")
      assert(parquetFiles(outDir).length == expected,
        s"expected $expected compacted files, got ${parquetFiles(outDir).length}")
      assert(out.count() ==
        Tables.load(spark, sf, "documents").count(), "compaction lost rows")
    } finally {
      deleteRecursively(smallDir)
      deleteRecursively(outDir)
    }
  }
}
