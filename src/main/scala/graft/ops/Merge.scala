package graft.ops

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE / DELETE on [[Manifest]] tables as COPY-ON-WRITE file
  * rewrites — the Delta `MERGE INTO` / `DELETE FROM` shape, and the reason
  * table formats track files instead of directories: a row-level change
  * must not rewrite a 100 TB table. Each operation identifies the files
  * that actually CONTAIN affected keys (one semi-join against the source
  * key set — broadcast while it fits, a shuffle semi-join past the size
  * gate, so a CDC backfill degrades instead of crashing the driver),
  * rewrites ONLY those files (carried rows keep their
  * values, matched rows update/drop, source-only rows insert), and
  * publishes atomically through [[Manifest.commit]]'s `removeFiles` mode —
  * the remove/add action pair. Untouched files are carried by REFERENCE:
  * their bytes are never read, moved, or rewritten, which is the entire
  * scale story (rewrite cost ∝ touched files, not table size). Removed
  * files stay on disk, so every earlier version keeps time-traveling, and
  * a merge commit reads as a row-level snapshot diff in
  * [[ChangeFeed.changes]] (insert/delete/update images by key — it IS a
  * row-level change, unlike the flagged-compaction replace).
  *
  * The touched-file list is a driver-side collect of FILE PATHS — the
  * commit-coordinator metadata action every table format performs (Delta's
  * matched-file listing), bounded by the table's file count, never data
  * rows. CHECK constraints in force gate the REWRITTEN rows exactly like
  * any commit: a violating source aborts the merge and publishes nothing.
  */
object Merge {

  /** Earned file accounting of one copy-on-write commit: what the table
    * held, what was rewritten, what was carried untouched (by reference —
    * the scale claim queries surface as flags). */
  case class CowStats(version: Long, filesBefore: Int, filesRewritten: Int,
      filesCarried: Int)

  /** Above this many distinct source keys the key set is NOT broadcast-
    * hinted: a hint overrides Spark's size threshold, so an unbounded
    * CDC-backfill source would OOM the driver instead of degrading.
    * 4M ~int64-tuple keys is comfortably inside the executor/driver
    * broadcast budget; past it the semi/anti joins fall back to shuffle
    * joins (AQE may still pick broadcast from the measured size). */
  val DefaultBroadcastKeyLimit: Long = 4L * 1000 * 1000

  /** MERGE upsert: rows of `source` whose `keyCols` match an existing row
    * REPLACE it (update); unmatched source rows INSERT. Only files
    * containing a matched key are rewritten; an insert-only merge
    * degenerates to a pure append (zero files rewritten). `source` must
    * carry exactly the table's columns (unionByName — loud on mismatch)
    * and at most one row per key — ENFORCED: a duplicate-key source
    * fails before anything is written (the Delta multiple-match error;
    * two source rows on one key would corrupt last-writer-wins
    * consumers like st29). The check shares one aggregate job with the
    * broadcast sizing: when the source holds at most
    * `broadcastKeyLimit` distinct keys the touch/rewrite joins probe a
    * BROADCAST key set (scan never shuffles); a larger source degrades
    * to shuffle semi/anti joins instead of crashing the driver —
    * MergeSpec proves the two paths produce identical results. */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame,
      keyCols: Seq[String],
      meta: Map[String, String] = Map.empty,
      broadcastKeyLimit: Long = DefaultBroadcastKeyLimit): CowStats = {
    require(keyCols.nonEmpty, "merge needs key columns")
    // MERGE into a not-yet-existing table creates it (the CREATE OR
    // MERGE shape streaming sinks need for their first micro-batch)
    if (Manifest.version(tablePath) == 0L)
      return CowStats(Manifest.commit(source, tablePath, meta = meta),
        0, 0, 0)
    // ONE bounded aggregate over the source keys serves both guards:
    // per-key row counts roll up to (distinct keys, max rows per key) —
    // the duplicate-key precondition check and the broadcast gate.
    val guard = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("__k"), max(col("__n")).as("__m")).head()
    val keyCount = guard.getLong(0)
    val maxPerKey = if (guard.isNullAt(1)) 0L else guard.getLong(1)
    require(maxPerKey <= 1L,
      s"MERGE source has duplicate keys on (${keyCols.mkString(", ")}): " +
        s"up to $maxPerKey source rows share one key; a MERGE source " +
        "must carry at most one row per key")
    val srcKeys = source.select(keyCols.map(col): _*).distinct()
    val keys =
      if (keyCount <= broadcastKeyLimit) broadcast(srcKeys) else srcKeys
    cowRewrite(spark, tablePath,
      touches = snap => snap.join(keys, keyCols, "left_semi"),
      rewrite = touched =>
        touched.join(keys, keyCols, "left_anti")
          .unionByName(source),
      meta)
  }

  /** Idempotent [[upsert]] for replayable writers (the streaming MERGE
    * sink): the (appId, txnVersion) stamp publishes atomically with the
    * merge version ([[Manifest.lastTxn]]), and a replayed txnVersion
    * merges NOTHING — None. The [[Manifest.commitOnce]] contract applied
    * to the copy-on-write path. */
  def upsertOnce(spark: SparkSession, tablePath: String, source: DataFrame,
      keyCols: Seq[String], appId: String, txnVersion: Long,
      broadcastKeyLimit: Long = DefaultBroadcastKeyLimit)
      : Option[CowStats] = {
    require(appId.nonEmpty && !appId.contains("=") && !appId.contains("\n"),
      s"invalid txn appId '$appId'")
    if (Manifest.lastTxn(tablePath, appId) >= txnVersion) None
    else Some(upsert(spark, tablePath, source, keyCols,
      meta = Map(s"${Manifest.TxnPrefix}$appId" -> txnVersion.toString),
      broadcastKeyLimit = broadcastKeyLimit))
  }

  /** DELETE FROM ... WHERE `pred`: rows matching `pred` drop; only files
    * CONTAINING a matching row are rewritten (with the survivors of those
    * files), everything else is carried by reference. A predicate that
    * matches nothing publishes nothing (returns the no-op stats with the
    * current version). */
  def deleteWhere(spark: SparkSession, tablePath: String, pred: Column,
      meta: Map[String, String] = Map.empty): CowStats =
    cowRewrite(spark, tablePath,
      touches = snap => snap.filter(pred),
      rewrite = touched => touched.filter(!pred),
      meta, skipWhenUntouched = true)

  /** The shared copy-on-write skeleton: locate the files `touches` hits,
    * re-emit them through `rewrite`, publish with `removeFiles`. */
  private def cowRewrite(spark: SparkSession, tablePath: String,
      touches: DataFrame => DataFrame, rewrite: DataFrame => DataFrame,
      meta: Map[String, String],
      skipWhenUntouched: Boolean = false): CowStats = {
    val before = Manifest.files(tablePath)
    val base = Manifest.read(spark, tablePath) // one manifest resolve
    val schema = base.schema
    val snap = base.withColumn("__f", col("_metadata.file_path"))
    // Driver-side FILE-PATH listing — the commit coordinator's matched-
    // file metadata action (bounded by the table's file count, no data
    // rows cross the driver); the data itself moves executor-side below.
    val touchedAbs = touches(snap).select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (touchedAbs.isEmpty && skipWhenUntouched)
      return CowStats(Manifest.version(tablePath), before.size, 0,
        before.size)
    val tblRoot = Paths.get(tablePath).toAbsolutePath.normalize
    val touchedRel = touchedAbs.map { p =>
      val fsPath = // _metadata.file_path is a URI (file:/...): decode it
        if (p.startsWith("file:")) new java.net.URI(p).getPath else p
      tblRoot.relativize(
        Paths.get(fsPath).toAbsolutePath.normalize).toString
    }
    val touchedRows =
      if (touchedAbs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(touchedAbs: _*)
    val v = Manifest.commit(rewrite(touchedRows), tablePath, meta = meta,
      removeFiles = touchedRel)
    CowStats(v, before.size, touchedRel.size,
      before.size - touchedRel.size)
  }
}
