package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cache.SeriesCache
import graft.functions.{dates, numeric}
import graft.model.SeriesQuery
import graft.ops.Relational

/** The BCRP time-series fetch lifecycle (SURVEY §3.1) as a Spark pipeline:
  *
  *   validate (semi/anti vs catalog) → cache delta probe → ingest only the
  *   delta (long form) → frequency-aware date parse → pivot to wide →
  *   upsert into the cache → projected load.
  *
  * The network fetch itself is injected (`fetchLong`): tests and offline
  * runs pass a fixture frame; a live deployment passes a driver-side HTTP
  * reader. Everything after injection is pure `DataFrame => DataFrame`, so
  * the whole lifecycle is replayable and oracle-checkable.
  */
final class BCRPPipeline(spark: SparkSession, cache: SeriesCache,
    catalog: DataFrame) {

  /** (valid, invalid) code split against the catalog — SURVEY §3.1 step 2.
    * Reference `perustats/BCRP/metadata.py:252-306`. Returns DataFrames so
    * the pipeline itself never materializes to the driver; the application
    * edge (which owns the network fetch loop anyway) collects the handful of
    * codes it is about to request. */
  def validate(query: SeriesQuery): (DataFrame, DataFrame) = {
    import spark.implicits._
    val requested = query.normalized.toDF("code")
    Relational.validateCodes(requested, broadcast(catalog), "code")
  }

  /** Catalog search: case-insensitive contains-any of LITERAL terms over
    * the description column (the reference regex-escapes each term —
    * `BCRPMetadata.search`, `perustats/BCRP/metadata.py:317-340`). */
  def search(terms: Seq[String]): DataFrame =
    catalog.filter(graft.functions.text.containsAnyLiteral(
      col("description"), terms))

  /** RANKED catalog search — the introspection API grown the way the
    * reference's docstring plans ("a search layer can be plugged in later
    * without changing the interface", `metadata.py:317-340`): rows
    * matching ANY of the case-insensitive literal terms, ranked by how
    * many terms they match (then by code for a total order). One
    * map-side filter + a TakeOrdered-friendly sort — no shuffle beyond
    * the ordering, catalog-sized (small) by construction. */
  def searchCatalog(terms: Seq[String]): DataFrame = {
    val matched = terms
      .map(t => when(graft.functions.text.containsAnyLiteral(
        col("description"), Seq(t)), 1).otherwise(0))
      .reduceOption[org.apache.spark.sql.Column](_ + _).getOrElse(lit(0))
    catalog.withColumn("matched_terms", matched)
      .filter(col("matched_terms") > 0)
      .orderBy(col("matched_terms").desc, col("code"))
  }

  /** Fetch one frequency group: compute the not-yet-cached delta, ingest it
    * via `fetchLong`, parse + pivot, upsert, and return the projected wide
    * frame for ALL requested codes (cached + new).
    *
    * `fetchLong(codes)` must return a long frame (date_str, series, value)
    * in the reference's API shape (`perustats/BCRP/utils.py:114-144`).
    */
  def fetchFrequency(freq: String, query: SeriesQuery,
      fetchLong: Seq[String] => DataFrame): DataFrame = {
    val codes = query.byFrequency.getOrElse(freq, Nil)
    val delta = cache.missingCodes(freq, query.start, query.end, codes)
    if (delta.nonEmpty) {
      val long = fetchLong(delta)
      val parsed = long.select(
        dates.bcrpDate(freq, col("date_str")).as("date"),
        col("series"),
        numeric.tryNumeric(col("value")).as("value"))
      val wide = Relational.pivotSeries(parsed, "date", "series", "value",
        seriesValues = delta)
      cache.save(freq, query.start, query.end, wide)
    }
    cache.load(freq, query.start, query.end, codes)
  }

  /** Full query: fetch each frequency group, return the per-frequency wide
    * frames (the reference's `result[freq] = df`,
    * `perustats/BCRP/fetcher.py:55-87`). `query` is expected to be
    * pre-validated (see [[validate]]) — the edge materializes the valid-code
    * split once before driving the network fetch loop. */
  def run(query: SeriesQuery,
      fetchLong: (String, Seq[String]) => DataFrame): Map[String, DataFrame] =
    query.byFrequency.keys.map { freq =>
      freq -> fetchFrequency(freq, query, fetchLong(freq, _))
    }.toMap
}
