package graft.cache

import org.apache.spark.sql.DataFrame

/** The reference's series-cache contract (`perustats/BCRP/cache.py`):
  * one wide table per (frequency, start, end) — `date` + one column per
  * series code — with schema evolving as new codes arrive and rows merging
  * by date on re-save. Two storage engines implement it:
  *
  *  - [[ParquetCache]]: columnar files + `_CURRENT` pointer (the scale
  *    default — projected loads prune columns at the parquet scan);
  *  - [[JdbcCache]]: an embedded-Derby JDBC database — the drop-in parity
  *    path for reference consumers whose state layer is a local SQL file.
  *    (The environment ships no SQLite JDBC driver; Derby is the bundled
  *    embedded engine, so SQLite-file parity is by-interface, not by-file.
  *    Documented divergence.)
  *
  * Both are single-writer by design, like the reference's SQLite file.
  */
trait SeriesCache {

  /** Column names cached for this (freq, start, end) key, minus `date`. */
  def cachedCodes(freq: String, start: String, end: String): Seq[String]

  /** Upsert `incoming` (wide: date + code columns): full-outer merge on
    * `date`, incoming values win, new codes become new columns. */
  def save(freq: String, start: String, end: String, incoming: DataFrame): Unit

  /** Projected read: only `date` + the requested codes that exist. */
  def load(freq: String, start: String, end: String,
      codes: Seq[String]): DataFrame

  /** Delta of requested codes not yet cached — the incremental-fetch
    * pruning at the heart of the reference
    * (`perustats/BCRP/fetcher.py:68-72`). */
  def missingCodes(freq: String, start: String, end: String,
      requested: Seq[String]): Seq[String] = {
    val cached = cachedCodes(freq, start, end).map(_.toUpperCase).toSet
    requested.filterNot(c => cached.contains(c.toUpperCase))
  }
}
