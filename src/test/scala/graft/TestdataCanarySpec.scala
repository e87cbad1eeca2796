package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Testdata-drift canary (r8 post-mortem, VERDICT task 3).
  *
  * The driver owns `/root/testdata` and may regenerate it between (or
  * during) rounds — in r8 events.ts changed physical type from
  * TIMESTAMP(NANOS) to timestamp[us] and a hard-wired loader
  * assumption took down 40 of 94 gates. This spec is the tripwire:
  * a regeneration that changes any table's *logical* contract must
  * break exactly these named tests, not 40 downstream gates.
  *
  * Three guarantees:
  *  1. every table × every sf dir loads, with the pinned logical
  *     schema (names + types) and at least one readable row;
  *  2. the events loader is physical-type-adaptive: a nanos-as-long
  *     ts column and the shipped ts column both load to identical
  *     logical schema AND identical values;
  *  3. one broken table does not take down registration of the other
  *     nine (registerAll containment, VERDICT task 2).
  */
class TestdataCanarySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Pinned logical contract — what every query in the repo assumes.
    * Types are Spark simpleString forms after Tables.load.
    */
  private val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int")
  )

  test("canary: every table in every sf dir loads with the pinned logical schema") {
    for (dir <- sfDirs; t <- Tables.names) {
      val df = Tables.load(spark, dir, t)
      val got = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      assert(got == expectedSchemas(t),
        s"LOGICAL SCHEMA DRIFT in $dir/$t.parquet — the driver " +
          s"regenerated testdata with a different contract.\n  got:      " +
          s"$got\n  expected: ${expectedSchemas(t)}")
      assert(!df.isEmpty, s"$dir/$t.parquet has no readable rows")
    }
  }

  test("canary: documents.source values keep the 'src<digits>' format") {
    // mix1_temperature_mix derives its meta-source groups from the
    // numeric source suffix; both engines degrade identically (null
    // group) if the format changes, but the drift should surface HERE
    // as a named failure, not as a silent regrouping of the mix gate.
    import org.apache.spark.sql.functions.col
    for (dir <- sfDirs) {
      val bad = Tables.load(spark, dir, "documents")
        .select(col("source")).distinct()
        .filter(!col("source").rlike("^src[0-9]+$"))
        .collect().map(_.getString(0))
      assert(bad.isEmpty,
        s"SOURCE FORMAT DRIFT in $dir/documents.parquet — values not " +
          s"matching src<digits>: ${bad.take(5).mkString(", ")}")
    }
  }

  test("canary: customer names keep the 'Customer#' + 9-digit 18-char shape") {
    // er1/er2 (entity resolution) derive their dirty fixtures and
    // their deletion-neighborhood keys from this exact shape
    // (SuffixStart=10, SuffixLen=9, NameLen=18); a regeneration that
    // changes name length or suffix format must surface HERE as a
    // named failure, not as er-gate hash mismatches.
    import org.apache.spark.sql.functions.col
    for (dir <- sfDirs) {
      val bad = Tables.load(spark, dir, "customer")
        .select(col("c_name"))
        .filter(!col("c_name").rlike("^Customer#[0-9]{9}$"))
        .limit(5).collect().map(_.getString(0))
      assert(bad.isEmpty,
        s"CUSTOMER NAME SHAPE DRIFT in $dir/customer.parquet — " +
          s"values not matching Customer#<9 digits>: ${bad.mkString(", ")}")
    }
  }

  test("canary: real id ranges stay below the planted-fixture offsets") {
    // sdd1 plants copies at vec_id+100000; er1/er2 plant dirty rows at
    // c_custkey+1000000/+2000000. If a regenerated corpus ever grows
    // past an offset, planted ids collide with real ones and the
    // two-sided gates (and the id>=offset test heuristics) silently
    // corrupt — surface that HERE as a named failure.
    import org.apache.spark.sql.functions.{col, max}
    for (dir <- sfDirs) {
      val maxVec = Tables.load(spark, dir, "embeddings")
        .agg(max(col("vec_id"))).collect()(0).getLong(0)
      assert(maxVec < 100000L,
        s"$dir embeddings.vec_id max $maxVec >= sdd1 planted offset 100000")
      val maxCust = Tables.load(spark, dir, "customer")
        .agg(max(col("c_custkey"))).collect()(0).getLong(0)
      assert(maxCust < 1000000L,
        s"$dir customer.c_custkey max $maxCust >= er planted offset 1000000")
    }
  }

  /** Canonical one-line parquet footer schema of a testdata file —
    * the PHYSICAL contract (primitive types + logical annotations),
    * which the logical canary above cannot see: the r8 drift was
    * events.ts flipping TIMESTAMP(NANOS)→micros, which the adaptive
    * loader absorbs SILENTLY. This string makes the next silent
    * regeneration show up as a named canary diff even when every
    * query keeps passing. */
  private def footerSchema(path: String): String = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.toString
      .replaceAll("\\s+", " ").trim
    finally r.close()
  }

  /** Pinned physical footer contract (r9 verdict #8). A mismatch here
    * with the logical canary still green means the driver regenerated
    * testdata in a shape the adaptive loader absorbs — update the pin
    * CONSCIOUSLY after checking the loader still converts losslessly
    * (the r8 post-mortem's exact failure mode). */
  private val expectedFooters: Map[String, String] = Map(
    "region" -> ("message schema { optional int32 r_regionkey; " +
      "optional binary r_name (STRING); }"),
    "nation" -> ("message schema { optional int32 n_nationkey; " +
      "optional binary n_name (STRING); optional int32 n_regionkey; }"),
    "customer" -> ("message schema { optional int64 c_custkey; " +
      "optional binary c_name (STRING); optional int32 c_nationkey; " +
      "optional double c_acctbal; optional binary c_mktsegment (STRING); }"),
    "supplier" -> ("message schema { optional int64 s_suppkey; " +
      "optional binary s_name (STRING); optional int32 s_nationkey; " +
      "optional double s_acctbal; }"),
    "part" -> ("message schema { optional int64 p_partkey; " +
      "optional binary p_name (STRING); optional binary p_brand (STRING); " +
      "optional binary p_type (STRING); optional int32 p_size; " +
      "optional double p_retailprice; }"),
    "orders" -> ("message schema { optional int64 o_orderkey; " +
      "optional int64 o_custkey; optional binary o_orderstatus (STRING); " +
      "optional double o_totalprice; " +
      "optional int64 o_orderdate (TIMESTAMP(MICROS,false)); " +
      "optional binary o_orderpriority (STRING); }"),
    "lineitem" -> ("message schema { optional int64 l_orderkey; " +
      "optional int64 l_partkey; optional int64 l_suppkey; " +
      "optional int32 l_linenumber; optional double l_quantity; " +
      "optional double l_extendedprice; optional double l_discount; " +
      "optional double l_tax; optional binary l_returnflag (STRING); " +
      "optional binary l_linestatus (STRING); " +
      "optional int64 l_shipdate (TIMESTAMP(MICROS,false)); }"),
    "events" -> ("message schema { optional int64 event_id; " +
      "optional int64 ts (TIMESTAMP(MICROS,false)); " +
      "optional int64 user_id; optional binary event_type (STRING); " +
      "optional double value; optional binary props (STRING); }"),
    "documents" -> ("message schema { optional int64 doc_id; " +
      "optional binary text (STRING); optional binary lang (STRING); " +
      "optional binary source (STRING); optional int64 n_chars; }"),
    "embeddings" -> ("message schema { optional int64 vec_id; " +
      "optional group embedding (LIST) { repeated group list { " +
      "optional float element; } } optional int32 label; }")
  )

  test("canary: every table's parquet PHYSICAL footer type is the pinned shape") {
    for (dir <- sfDirs; t <- Tables.names) {
      val got = footerSchema(s"$dir/$t.parquet")
      assert(got == expectedFooters(t),
        s"PHYSICAL FOOTER DRIFT in $dir/$t.parquet — the driver " +
          "regenerated testdata with a different parquet physical shape " +
          "(the adaptive loader may be absorbing it silently; check the " +
          s"conversion is still lossless, then re-pin).\n  got:      " +
          s"$got\n  expected: ${expectedFooters(t)}")
    }
  }

  test("canary: events loader is adaptive — nanos-as-long and native timestamp load identically") {
    val sf = SparkTestSession.sf
    val tmp = Files.createTempDirectory("graft-canary-nanos").toFile
    tmp.deleteOnExit()
    val nanosDir = tmp.getAbsolutePath
    // Synthesize the OLD physical shape: ts as int64 nanoseconds.
    // (With legacy.parquet.nanosAsLong=true, parquet TIMESTAMP(NANOS)
    // and plain INT64 both surface as LongType, so this exercises the
    // exact LongType branch of Tables.load.)
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    val fromNanos = Tables.load(spark, nanosDir, "events")
    val fromNative = Tables.load(spark, sf, "events")
    assert(fromNanos.schema == fromNative.schema,
      s"adaptive loader produced different logical schemas:\n  nanos:  " +
        s"${fromNanos.schema}\n  native: ${fromNative.schema}")
    // Values identical: anti-join both ways must be empty.
    assert(fromNanos.exceptAll(fromNative).isEmpty &&
      fromNative.exceptAll(fromNanos).isEmpty,
      "adaptive loader produced different VALUES for nanos vs native ts")
  }

  test("canary: one broken table fails only itself — other nine still register and query") {
    val sf = SparkTestSession.sf
    val tmp = Files.createTempDirectory("graft-canary-poison").toFile
    tmp.deleteOnExit()
    val dir = tmp.getAbsolutePath
    // Nine good tables (copy the real sf0.001 parquet files), one
    // poisoned: events.parquet is garbage bytes, unreadable as parquet.
    Tables.names.filterNot(_ == "events").foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"),
        Paths.get(s"$dir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    Files.write(Paths.get(s"$dir/events.parquet"),
      "this is not a parquet file".getBytes)

    // The body re-points the SHARED session's registration at the
    // temp dir; restore it in finally so a mid-test assertion failure
    // cannot leave later suites querying the poisoned dataset.
    try {
    // Must not throw despite the poisoned table...
    Tables.registerAll(spark, dir)
    // ...the other nine still answer SQL...
    val n = spark.sql("SELECT count(*) AS c FROM lineitem").collect()(0).getLong(0)
    assert(n > 0, "lineitem did not survive a broken events table")
    val j = spark.sql(
      "SELECT count(*) FROM orders o, customer c WHERE o.o_custkey = c.c_custkey")
      .collect()(0).getLong(0)
    assert(j > 0, "orders⋈customer did not survive a broken events table")
    // ...and events itself fails LOUDLY at resolution, not silently
    // serving stale data from a previous registration.
    val err = intercept[Exception] {
      spark.sql("SELECT count(*) FROM events").collect()
    }
    assert(err.getMessage.toLowerCase.contains("events"), err.getMessage)

    // Failed registration must NOT be memoized: re-pointing at good
    // data recovers without a new session.
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Tables.registerAll(spark, dir)
    val e = spark.sql("SELECT count(*) FROM events").collect()(0).getLong(0)
    assert(e > 0, "events did not recover after the poisoned file was fixed")
    } finally {
      // Leave the shared session registered back on the spec's sf dir
      // so later suites in the same JVM see the standard tables.
      Tables.registerAll(spark, sf)
    }
  }
}
