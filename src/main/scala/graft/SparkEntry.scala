package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import graft.pipeline.{Clustering, CorpusIO, Dedup, EntityResolution, Graph, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Extended, JoinVariants, Relational}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2; each module contributes its own map. `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL for the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q1_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-data-pipeline operator families (dedup / similarity / text /
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ JoinVariants.defs ++ Extended.defs ++
      Dedup.defs ++ Similarity.defs ++ TextAnalysis.defs ++
      Multimodal.defs ++ EventStreams.defs ++ CorpusIO.defs ++
      Graph.defs ++ Clustering.defs ++ EntityResolution.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ JoinVariants.oracle ++ Extended.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ TextAnalysis.oracle ++
      Multimodal.oracle ++ EventStreams.oracle ++ CorpusIO.oracle ++
      Graph.oracle ++ Clustering.oracle ++ EntityResolution.oracle
}
