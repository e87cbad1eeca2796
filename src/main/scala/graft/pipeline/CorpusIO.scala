package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables

/** Source/sink fidelity gates: write the documents corpus to a text
  * interchange format, read it back, and aggregate a content-exact
  * fingerprint. The DuckDB oracle computes the SAME fingerprint
  * straight from the parquet table, so the gate passes only if the
  * writer/reader pair is lossless for EVERY column of EVERY row.
  *
  * Fingerprint design: one md5 per row over ALL columns
  * (doc_id|lang|source|n_chars|text via concat_ws — both engines
  * stringify identically), then per source: row count, distinct-hash
  * count, and an ORDER-FREE exact sum of each hash's first 48 bits in
  * DECIMAL(38,0). The hash SUM is what makes it content-exact: a
  * reader bug that corrupts rows injectively (same number of distinct
  * wrong values) still shifts the sum; 48-bit values in a 38-digit
  * decimal cannot overflow at any real row count.
  *
  * Scale shape: parallel partitioned sink, parallel scan, one
  * partial/final hash-agg. The write lands in `GRAFT_IO_DIR` when
  * set (on a real cluster this must be shared storage — executors
  * write, the driver-side read lists the same path); default is the
  * driver-local java tmpdir, which is correct only in local mode.
  * Directories are removed by a JVM shutdown hook, after every
  * consumer of the lazily-read result has run. The export itself is
  * EAGER (the .save runs when the query function is invoked) — the
  * write cost is part of the operator being gated and benched.
  */
object CorpusIO {

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  private def tempDir(prefix: String): String = {
    val dir = sys.env.get("GRAFT_IO_DIR") match {
      case Some(base) => Files.createTempDirectory(Paths.get(base), prefix)
      case None => Files.createTempDirectory(prefix)
    }
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRec(dir.toFile)))
    dir.toString
  }

  /** All-column row hash + per-source rollup shared by the gates and
    * (textually mirrored) their oracle. */
  private def fingerprint(docs: DataFrame): DataFrame = {
    val h = md5(concat_ws("|", col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text")))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(h).as("n_unique"),
        sum(conv(substring(h, 1, 12), 16, 10).cast("decimal(38,0)"))
          .as("hash_sum"),
        sum(length(col("text"))).cast("long").as("len_total"))
  }

  private def roundTrip(spark: SparkSession, sfDir: String,
                        format: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = tempDir(s"graft_io_$format")
    val writer = docs.write.mode("overwrite")
    (format match {
      case "json" => writer
      // pin a concrete lossless CSV dialect: explicit quote/escape,
      // and NO whitespace trimming on either side (the writer trims
      // by default, which would silently eat padded text)
      case "csv" => writer.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    }).format(format).save(dir)
    val reader = spark.read.schema(docs.schema)
    val back = format match {
      case "json" => reader.json(dir)
      case "csv" => reader.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("multiLine", "true").csv(dir)
    }
    fingerprint(back)
  }

  /** Hive-style partitioned parquet layout + pruned read: write the
    * corpus partitioned by `lang`, read it back filtered to one
    * partition, fingerprint the slice. The filter must become a
    * PartitionFilter (directory pruning — only `lang=en/` files are
    * ever listed/opened; spec-pinned on the physical plan), which is
    * the layout decision that matters most at 100 TB: a
    * language-sliced training run reads 1/N of the corpus, not a
    * filter over all of it. The partition column itself round-trips
    * through directory names, so the all-column fingerprint also
    * gates that reconstruction. */
  private[graft] def partitionedRead(spark: SparkSession,
                                     sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = tempDir("graft_io_part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    spark.read.parquet(dir).filter(col("lang") === "en")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io1_json_roundtrip" -> ((spark, sfDir) => roundTrip(spark, sfDir, "json")),
    "io2_csv_roundtrip" -> ((spark, sfDir) => roundTrip(spark, sfDir, "csv")),
    "io3_partitioned_prune" -> ((spark, sfDir) =>
      fingerprint(partitionedRead(spark, sfDir)
        // partitionBy moves lang to the end of the schema; restore the
        // original column order so concat_ws hashes identical strings
        .select("doc_id", "text", "lang", "source", "n_chars"))))

  private def fingerprintSql(where: String): String =
    s"""WITH f AS (
       |  SELECT source,
       |    md5(concat_ws('|', doc_id, lang, source, n_chars, text)) AS h,
       |    length(text) AS len
       |  FROM documents$where)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
       |  sum(CAST(CAST('0x' || substr(h, 1, 12) AS BIGINT) AS DECIMAL(38,0)))
       |    AS hash_sum,
       |  CAST(sum(len) AS BIGINT) AS len_total
       |FROM f GROUP BY source""".stripMargin

  val oracle: Map[String, String] = Map(
    "io1_json_roundtrip" -> fingerprintSql(""),
    "io2_csv_roundtrip" -> fingerprintSql(""),
    "io3_partitioned_prune" -> fingerprintSql(" WHERE lang = 'en'"))
}
