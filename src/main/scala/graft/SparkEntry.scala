package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by SURVEY §2 section in graft.queries.*; each entry
  * pairs a Spark pipeline with (when SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  private def registry: Map[String, Q] =
    CoreQueries.defs ++ WindowAggQueries.defs ++ FunctionQueries.defs ++
      SourceQueries.defs ++ DedupQueries.defs ++ TextQueries.defs ++
      StreamPipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
