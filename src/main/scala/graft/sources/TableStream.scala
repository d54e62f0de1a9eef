package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{ChangeFeed, Manifest}

/** A [[graft.ops.Manifest]] table as a genuine Structured Streaming
  * SOURCE — the Delta streaming-source shape: offsets are table VERSIONS
  * (the commit log is the replay log), the first batch is the table
  * snapshot as of the stream's start, and every later batch is exactly
  * the rows APPENDED by the versions in `(start, end]`. Downstream
  * pipelines `readStream` a table another pipeline writes, with
  * exactly-once end-to-end when the sink is idempotent per batch (the
  * house `commitOnce` sinks): offsets live in the checkpoint, and a
  * replayed range re-reads the same manifests — versions are immutable.
  *
  * At 100 TB the per-trigger cost is the point: a trigger reads ONE
  * manifest head (driver-side, KB) to discover new versions, and each
  * batch scans only the files those versions ADDED — never the table.
  * The batch plan is a plain parquet `LogicalRelation`
  * ([[Bridge.streamingParquetScan]]), so the streaming query's filters
  * and projections push into the scan exactly as in batch.
  *
  * NON-APPEND commits (copy-on-write rewrites/compactions, deletion-
  * vector deletes/updates, restores) change or remove rows already
  * served, which a pure tail cannot represent: the stream FAILS LOUDLY
  * at that version by default — the Delta contract — or skips those
  * commits entirely under `skipChangeCommits=true` (compactions skip
  * losslessly: their rows were already served from the original files;
  * deletes/updates skip by design — the tail keeps what it saw).
  *
  * The schema is pinned per run at source creation (the head's recorded
  * schema); older files missing later-added columns read as nulls,
  * exactly like the batch reader.
  */
class TableStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  /** The SINK half — `writeStream.format("graft.sources.
    * TableStreamProvider").start(<tablePath>)`: every micro-batch
    * appends to the Manifest table EXACTLY-ONCE via the (appId,
    * batchId) txn stamp ([[Manifest.commitOnce]] — a replayed batch
    * after checkpoint recovery publishes nothing), with the skip-empty
    * contract (an empty batch publishes no version). Paired with the
    * source half, `readStream(up) → writeStream(down)` is end-to-end
    * exactly-once table replication with no user code. Append-only by
    * design: aggregation output modes need a merge, which is
    * `foreachBatch` + `Merge.upsertOnce` territory. Options:
    * `txnAppId` (namespace the stamp when several queries feed one
    * table), `statsCols` (record per-file min/max for data skipping). */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink takes no partition columns — the manifest (and " +
        "its per-file stats) is the layout")
    require(outputMode == OutputMode.Append(),
      s"graft-table sink is append-only, got $outputMode — " +
        "aggregation modes need foreachBatch + Merge")
    new TableStreamSink(pathOf(parameters),
      parameters.getOrElse("txnAppId", "graft_table_sink"),
      parameters.get("statsCols").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
  }

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-table stream needs .load(<tablePath>)"))

  private def pinnedSchema(tablePath: String): StructType = {
    require(Manifest.version(tablePath) > 0,
      s"graft-table stream: no committed version at $tablePath — the " +
        "table must exist before the stream starts (the pinned schema " +
        "and the initial snapshot both come from its head)")
    Manifest.schemaOf(tablePath).getOrElse(
      throw new IllegalStateException(
        s"no recorded schema at $tablePath"))
  }

  private def cdc(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(pinnedSchema(pathOf(parameters)))
    (shortName(),
      if (cdc(parameters)) TableStreamSource.cdcSchema(base) else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    // `schema` here is what sourceSchema returned — in CDC mode that is
    // the tagged schema; the source wants the BASE table schema and
    // re-derives the tagged one itself
    val base = if (cdc(parameters)) pinnedSchema(path)
      else schema.getOrElse(pinnedSchema(path))
    // startingVersion (the Delta option): serve only commits AFTER this
    // version — no initial snapshot. 'latest' = the head at stream
    // creation, i.e. "only data from now on".
    val startAfter = parameters.get("startingVersion").map(_.trim).map {
      case s if s.equalsIgnoreCase("latest") => Manifest.version(path)
      case s => try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"startingVersion must be a version number or 'latest', got '$s'")
      }
    }
    new TableStreamSource(sqlContext, path, base,
      parameters.get("skipChangeCommits").exists(_.trim.toBoolean),
      readChangeFeed = cdc(parameters),
      keyCols = parameters.get("keyCols").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
      startAfter = startAfter)
  }
}

/** See [[TableStreamProvider.createSink]]. */
class TableStreamSink(tablePath: String, appId: String,
    statsCols: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the handed frame wraps the micro-batch's incremental execution —
    // re-wrap as a plain batch frame before the batch write path
    val batch = Bridge.batchWrap(data)
    if (!batch.isEmpty)
      Manifest.commitOnce(batch, tablePath, appId, batchId,
        statsCols = statsCols)
    ()
  }

  override def toString: String = s"TableStreamSink[$tablePath]"
}

object TableStreamSource {
  /** CDC-mode output schema: the Delta CDF column convention —
    * `_commit_version`, `_change_type`, then the table's columns. */
  def cdcSchema(base: StructType): StructType = StructType(
    StructField(ChangeFeed.VersionCol, LongType, nullable = false) +:
    StructField(ChangeFeed.TypeCol, StringType, nullable = false) +:
    base.fields)
}

/** See [[TableStreamProvider]]. One instance per streaming query run.
  *
  * `readChangeFeed = true` switches the source to CDC MODE — the Delta
  * CDF streaming shape, which serves what the plain tail refuses: batch
  * 1 is the snapshot tagged as inserts, and every later batch is the
  * CHANGE IMAGES of the versions in `(start, end]`
  * ([[graft.ops.ChangeFeed.changes]] — appended rows as inserts,
  * deletion-vector deltas as deletes, rewrites as key-diffed
  * update/insert/delete images via `keyCols`, writer-flagged
  * compactions as nothing). A downstream applier that reduces each
  * batch to latest-change-per-key and applies upserts + deletes
  * maintains an exact replica THROUGH deletes and updates. */
class TableStreamSource(sqlContext: SQLContext, tablePath: String,
    baseSchema: StructType, skipChangeCommits: Boolean,
    readChangeFeed: Boolean = false, keyCols: Seq[String] = Seq.empty,
    startAfter: Option[Long] = None)
    extends Source {

  override val schema: StructType =
    if (readChangeFeed) TableStreamSource.cdcSchema(baseSchema)
    else baseSchema

  private def spark = sqlContext.sparkSession

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  private def abs(rel: String): String =
    Paths.get(tablePath).resolve(rel).toString

  override def getOffset: Option[Offset] = {
    val head = Manifest.version(tablePath)
    if (head <= 0) None else Some(LongOffset(head))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    // startingVersion turns the would-be snapshot batch into a plain
    // version walk from that point (no snapshot is ever served)
    val effStart = start.map(ver).orElse(startAfter)
    if (readChangeFeed) getCdcBatch(effStart, endV)
    else effStart match {
      case None =>
        // initial batch = the snapshot as of endV. A version with
        // deletion vectors in force snapshots through the DV-applied
        // read (join-shaped, so it rides the streaming tag as an RDD
        // boundary); the common DV-less case stays a pure pushdown-
        // capable parquet relation.
        if (Manifest.deletionVectors(tablePath, endV).isEmpty)
          Bridge.streamingParquetScan(spark, baseSchema,
            Manifest.files(tablePath, endV).map(abs))
        else
          Bridge.streamingWrap(
            Manifest.read(spark, tablePath, endV)
              .select(baseSchema.fieldNames.map(col).toSeq: _*))
      case Some(startV) =>
        val added = (math.max(startV, 0L) + 1 to endV).flatMap { v =>
          val prev =
            if (v == 1) Set.empty[String]
            else Manifest.files(tablePath, v - 1).toSet
          val cur = Manifest.files(tablePath, v)
          val removed = prev -- cur
          val dvChanged = Manifest.deletionVectors(tablePath, v) !=
            Manifest.deletionVectors(tablePath, v - 1)
          if (removed.isEmpty && !dvChanged) cur.filterNot(prev)
          else if (skipChangeCommits) Seq.empty
          else throw new IllegalStateException(
            s"graft-table stream on $tablePath: version $v is not a " +
              "pure append (" +
              (if (removed.nonEmpty) s"${removed.size} file(s) removed"
               else "deletion-vector state changed") +
              ") — a tail cannot represent rows changing after they " +
              "were served; set skipChangeCommits=true to skip such " +
              "commits, or readChangeFeed=true to receive them as " +
              "change images")
        }
        Bridge.streamingParquetScan(spark, baseSchema, added.map(abs))
    }
  }

  /** CDC-mode batches (see class doc). Both shapes are join-bearing
    * plans, so they ride the streaming tag as an RDD boundary
    * ([[Bridge.streamingWrap]]); the column order is pinned to
    * [[TableStreamSource.cdcSchema]]. */
  private def getCdcBatch(startV: Option[Long], endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val ordered = (df: DataFrame) => df.select(
      (col(ChangeFeed.VersionCol).cast("long") +:
        col(ChangeFeed.TypeCol) +:
        baseSchema.fieldNames.map(col).toSeq): _*)
    val batch = startV match {
      case None =>
        Manifest.read(spark, tablePath, endV)
          .withColumn(ChangeFeed.VersionCol, lit(endV))
          .withColumn(ChangeFeed.TypeCol, lit("insert"))
      case Some(s) if s >= endV =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          TableStreamSource.cdcSchema(baseSchema))
      case Some(s) =>
        ChangeFeed.changes(spark, tablePath, s, endV, keyCols)
    }
    Bridge.streamingWrap(ordered(batch))
  }

  override def stop(): Unit = ()

  override def toString: String = s"TableStreamSource[$tablePath]"
}
