package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PagedSource

/** The MTC homologación paged-table fetch (reference
  * `perustats/MTC/homologacion.py:38-95`) as a named pipeline over the
  * DSv2 [[graft.sources.PagedSource]]:
  *
  * reference lifecycle                      | here
  * -----------------------------------------|---------------------------
  * `first_page()` reads the total-row badge | `PageFetcher.totalRows()`
  * `ceil(total / per_page)` page count      | `planInputPartitions`
  * 10-thread driver pool fetches pages      | every page an InputPartition
  * `pd.concat` of the page frames           | the scan IS the union
  * rename → drop(n, nan) → parse date → sort| [[clean]]
  *
  * The parallelism moves from one driver's thread pool to the cluster —
  * at a million-row remote table the fetch fans out across executors and
  * column pruning still reaches each page request.
  */
object MTCHomologacion {

  /** Read the paged homologación table through the DSv2 source; the
    * fetcher class wraps the HTTP POST transport (tests inject a fixture
    * fetcher — the engine contract is identical). */
  def fetch(spark: SparkSession, fetcherClass: String,
      pageSize: Int = 10): DataFrame =
    spark.read.format(classOf[PagedSource].getName)
      .option("fetcher", fetcherClass)
      .option("pageSize", pageSize.toString)
      .load()

  /** The reference's post-concat cleanup (`homologacion.py:88-95`): drop
    * the UI row-number column, parse `date` from dd/MM/yyyy, newest
    * first (resolution id breaks date ties — without it same-date rows
    * come back in partition-dependent order). */
  def clean(raw: DataFrame): DataFrame =
    raw.drop("n")
      .withColumn("date", to_date(col("date"), "dd/MM/yyyy"))
      .orderBy(col("date").desc, col("resolucion"))

  /** The full lifecycle in one call. */
  def run(spark: SparkSession, fetcherClass: String,
      pageSize: Int = 10): DataFrame =
    clean(fetch(spark, fetcherClass, pageSize))
}
