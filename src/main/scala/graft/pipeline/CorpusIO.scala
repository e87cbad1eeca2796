package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables

/** Source/sink fidelity gates: write the documents corpus to a text
  * interchange format, read it back, and aggregate a content-exact
  * fingerprint (per-source counts + distinct md5 of the text). The
  * DuckDB oracle computes the SAME aggregate straight from the
  * parquet table, so the gate passes only if the engine's
  * writer/reader pair is lossless for every row — quoting, escaping,
  * unicode, schema — not just row counts.
  *
  * Scale shape: the write is a parallel partitioned sink and the
  * read a parallel scan (both width = cluster), the aggregate is one
  * partial/final hash-agg on the low-cardinality source key. At
  * 100 TB this is exactly the export/import path a pipeline uses to
  * hand a corpus to a tokenizer or another system; the round-trip
  * fingerprint is the cheap way to prove the handoff lossless.
  */
object CorpusIO {

  /** Content fingerprint shared by both round-trip gates and their
    * oracle: md5 over text is the exactness witness. */
  private def fingerprint(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        sum(length(col("text"))).cast("long").as("len_total"))

  private def roundTrip(spark: SparkSession, sfDir: String,
                        format: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory(s"graft_io_$format").toString
    val writer = docs.write.mode("overwrite")
    (format match {
      case "json" => writer
      // explicit quote/escape so the gate pins a concrete CSV dialect
      // (multiLine read covers embedded newlines if a corpus has them)
      case "csv" => writer.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
    }).format(format).save(dir)
    val reader = spark.read.schema(docs.schema)
    val back = format match {
      case "json" => reader.json(dir)
      case "csv" => reader.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
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
    * through directory names, so the fingerprint also gates that
    * reconstruction. */
  private[graft] def partitionedRead(spark: SparkSession,
                                     sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("graft_io_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    spark.read.parquet(dir).filter(col("lang") === "en")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io1_json_roundtrip" -> ((spark, sfDir) => roundTrip(spark, sfDir, "json")),
    "io2_csv_roundtrip" -> ((spark, sfDir) => roundTrip(spark, sfDir, "csv")),
    "io3_partitioned_prune" -> ((spark, sfDir) =>
      fingerprint(partitionedRead(spark, sfDir))))

  private val fingerprintSql =
    """SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
      |  CAST(sum(length(text)) AS BIGINT) AS len_total
      |FROM documents GROUP BY source""".stripMargin

  val oracle: Map[String, String] = Map(
    "io1_json_roundtrip" -> fingerprintSql,
    "io2_csv_roundtrip" -> fingerprintSql,
    "io3_partitioned_prune" ->
      fingerprintSql.replace("FROM documents",
        "FROM documents WHERE lang = 'en'"))
}
