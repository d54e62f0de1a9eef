package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** File-level plumbing for COMMIT-ATOMIC index fold-ins (the
  * [[graft.streaming.Streams]] Txn.foldOnce protocol): a micro-batch's
  * index delta is first STAGED as ordinary Spark output in a scratch
  * directory nobody reads, then PUBLISHED into the live bucketed-table
  * directories by hard-linking the staged files under deterministic,
  * batch-tagged names. Because the staging content is frozen before any
  * link is created (the `.staged` marker), every publish step is
  * idempotent — a link that already exists is skipped, a stale
  * generation file is re-deleted — so a crash at ANY point replays to
  * exactly-once, with no window in which the fold is applied but
  * unrecorded.
  *
  * Linked names keep the staged file's tail, so Spark's bucket-id
  * parse (`..._00003.c000.snappy.parquet`) still resolves and the
  * bucketed layout — and every no-shuffle probe property riding on it —
  * is preserved. Appends link-only ([[linkAppend]]); statistics tables
  * that fold by read-merge-rewrite publish as a tagged generation
  * REPLACE ([[linkReplace]]: delete every file not carrying this
  * batch's tag, then link the staged generation in).
  */
private[graft] object FoldFiles {

  /** Test seam: simulated-crash countdown. When >= 0, each publish-side
    * file operation (delete or link) decrements it and throws once it
    * reaches zero — the kill-injection the replay specs drive through
    * every crash window. Production value is -1 (off). */
  private[graft] var failAfterOps: Int = -1

  private def maybeCrash(): Unit =
    if (failAfterOps >= 0) {
      failAfterOps -= 1
      if (failAfterOps < 0)
        throw new RuntimeException("simulated crash (FoldFiles test seam)")
    }

  private def parquets(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.toArray.map(_.asInstanceOf[Path]).toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      finally s.close()
    }

  /** Copy `src` to `dest` so `dest` appears fully-formed or not at all
    * (write a sibling temp, then POSIX rename — atomic on one mount).
    * This preserves the link path's crash contract for the copy
    * fallbacks: a replay that sees `dest` existing may safely treat the
    * publish step as done, because a crash mid-copy strands only a
    * hidden `.tmp` (which [[parquets]] never lists), never a torn
    * `dest`. Rename-over-existing is the IDEMPOTENT replay (frozen
    * staging ⇒ byte-identical content). */
  private def copyAtomic(dest: Path, src: Path): Unit = {
    val tmp = Files.createTempFile(dest.getParent,
      s".${dest.getFileName}-", ".tmp")
    Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
  }

  private def linkOrCopy(dest: Path, src: Path): Unit =
    try Files.createLink(dest, src)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => () // replayed
      case _: UnsupportedOperationException =>
        // no hard links on this filesystem: atomic copy, replay-safe
        copyAtomic(dest, src)
      case _: java.nio.file.FileSystemException
          if !Files.exists(dest) =>
        // hard link REFUSED rather than unsupported — the EXDEV case:
        // staging (checkpoint dir) and destination (warehouse) on
        // different mounts fails with FileSystemException, not
        // UnsupportedOperationException, and without this fallback every
        // publish AND every replay would throw identically, wedging the
        // fold forever. Same atomic copy (frozen source). The !exists
        // guard keeps genuine dest-side errors (permissions on an
        // existing, fully-formed file) loud instead of silently
        // re-copied over.
        copyAtomic(dest, src)
    }

  /** Publish a staged APPEND: link every staged parquet into `destDir`
    * as `<tag>-<stagedName>`. Idempotent given frozen staging. */
  def linkAppend(stagingSub: String, destDir: String, tag: String): Unit = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    parquets(Paths.get(stagingSub)).foreach { f =>
      maybeCrash()
      linkOrCopy(dest.resolve(s"$tag-${f.getFileName}"), f)
    }
  }

  /** Publish a staged REPLACE: drop every parquet in `destDir` NOT
    * tagged as this batch's generation, then link the staged files in.
    * Idempotent given frozen staging; a crash mid-replace leaves a torn
    * view only until the replay completes it (single-writer per index,
    * and probe sessions re-resolve via refresh — the same visibility
    * caveat as Spark's own overwrite). */
  def linkReplace(stagingSub: String, destDir: String, tag: String): Unit = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    parquets(dest).filterNot(_.getFileName.toString.startsWith(s"$tag-"))
      .foreach { f => maybeCrash(); Files.deleteIfExists(f) }
    parquets(Paths.get(stagingSub)).foreach { f =>
      maybeCrash()
      linkOrCopy(dest.resolve(s"$tag-${f.getFileName}"), f)
    }
  }

  /** Write `df` as BUCKETED parquet at `path` without touching any live
    * table: `bucketBy` requires a catalog table, so the write goes
    * through a transient external table that is dropped immediately
    * (external ⇒ the files stay). The staged files carry Spark's
    * bucket-id suffix, which [[linkAppend]]/[[linkReplace]] preserve. */
  def writeBucketed(df: DataFrame, bucketCols: Seq[String],
      sortCols: Seq[String], buckets: Int, path: String,
      tmpTable: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    // Cluster by the bucket columns first (repartition and bucketBy share
    // murmur3 hash partitioning, see TextIndex.compact) so each task holds
    // exactly one bucket and the write emits ONE file per bucket — without
    // it a misaligned upstream partitioning scatters up to tasks×buckets
    // small files per stage (the r17 bands table measured 681 files at 32
    // buckets), and every later probe pays the footer reads. This is the
    // hash write-distribution mode table formats use for the same reason.
    val w = df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).option("path", path).saveAsTable(tmpTable)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
  }

  /** Filesystem location of a catalog table (the bucketed index tables
    * register with explicit external paths). */
  def tableLocation(spark: SparkSession, table: String): String = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    Paths.get(spark.sessionState.catalog.getTableMetadata(ident).location)
      .toString
  }
}
