package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.ops.{Layout, Manifest}
import graft.sources.GraftCatalog

/** SQL surface for the table-MAINTENANCE verbs every lakehouse exposes
  * (the operational half of the SQL story — the DML/DDL half lives in
  * [[GraftSqlDml]]):
  *
  *   OPTIMIZE graft.t [WHERE col BETWEEN lo AND hi
  *                     | ZORDER BY (c1[, c2])] [INTO n FILES]
  *   VACUUM graft.t RETAIN n VERSIONS
  *   RESTORE [TABLE] graft.t TO VERSION AS OF v
  *   RESTORE [TABLE] graft.t TO TIMESTAMP AS OF 'yyyy-mm-dd hh:mm:ss'
  *
  * These verbs are not in Spark's grammar (Delta adds them the same
  * way), so a [[ParserInterface]] delegate intercepts EXACTLY these
  * statement shapes and hands everything else to Spark's parser
  * verbatim. Each verb routes to the SAME engine as the Scala API —
  * [[Layout.optimizeWhere]]/[[Layout.compact]], [[Manifest.vacuum]],
  * [[Manifest.restore]] — under the full commit protocol, and returns
  * its engine's counters as a result row. The table identifier resolves
  * through the session's catalog manager at RUN time: a non-graft
  * catalog refuses loudly (these are graft table-format operations, not
  * generic SQL).
  *
  * VACUUM requires an EXPLICIT `RETAIN n VERSIONS`: it is the one verb
  * here that destroys data (time travel beyond the horizon dies), and a
  * destructive sweep must never default its retention. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // one identifier: dotted parts, each bare or backtick-quoted (the
  // graft.`/abs/path` convention); splitting is delegated to Spark's
  // parseMultipartIdentifier so quoting rules stay exactly Spark's
  private val Ident = "((?:`[^`]+`|[\\w$]+)(?:\\s*\\.\\s*(?:`[^`]+`|[\\w$]+))*)"
  private val Col = "(`[^`]+`|[\\w$]+)"
  private val Num = "(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)"

  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + Ident +
      "(?:\\s+WHERE\\s+" + Col + "\\s+BETWEEN\\s+" + Num +
      "\\s+AND\\s+" + Num + ")?" +
      "(?:\\s+ZORDER\\s+BY\\s+\\(\\s*" + Col +
      "(?:\\s*,\\s*" + Col + ")?\\s*\\))?" +
      "(?:\\s+INTO\\s+(\\d+)\\s+FILES?)?\\s*;?\\s*$").r
  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + Ident +
      "(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?)?\\s*;?\\s*$").r
  private val RestoreVRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?" + Ident +
      "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val RestoreTsRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?" + Ident +
      "\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$").r

  private def unquote(c: String): String =
    if (c.startsWith("`")) c.stripPrefix("`").stripSuffix("`") else c

  private[plans] def parseMaintenance(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case OptimizeRe(ident, colN, lo, hi, z1, z2, nFiles) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      val where = Option(colN).map(c =>
        (unquote(c), lo.toDouble, hi.toDouble))
      val zorder = Option(z1).map(a =>
        Seq(unquote(a)) ++ Option(z2).map(unquote))
      if (where.isDefined && zorder.isDefined)
        throw new UnsupportedOperationException(
          "graft OPTIMIZE takes WHERE or ZORDER BY, not both — " +
            "cluster a targeted slice via the Scala API " +
            "(Layout.optimizeWhere, then optimizeZOrder) or z-order " +
            "the whole table")
      Some(GraftOptimizeCommand(parts, where, zorder,
        Option(nFiles).map(_.toInt).getOrElse(1)))
    case VacuumRe(ident, retain) =>
      if (retain == null)
        throw new IllegalArgumentException(
          "graft VACUUM requires an explicit retention: VACUUM " +
            s"$ident RETAIN <n> VERSIONS — a destructive sweep never " +
            "defaults how much history it destroys")
      Some(GraftVacuumCommand(
        delegate.parseMultipartIdentifier(ident), retain.toInt))
    case RestoreVRe(ident, v) =>
      Some(GraftRestoreCommand(delegate.parseMultipartIdentifier(ident),
        toVersion = Some(v.toLong), toTsMillis = None))
    case RestoreTsRe(ident, ts) =>
      val millis = try java.sql.Timestamp.valueOf(ts).getTime
      catch {
        case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"RESTORE … TO TIMESTAMP AS OF: cannot parse '$ts' — use " +
              "'yyyy-mm-dd hh:mm:ss[.fff]'")
      }
      Some(GraftRestoreCommand(delegate.parseMultipartIdentifier(ident),
        toVersion = None, toTsMillis = Some(millis)))
    case _ => None
  }

  /** Resolve a maintenance verb's identifier to a graft table path at
    * RUN time (the parser cannot see catalogs): the first part must
    * name a registered [[GraftCatalog]]. */
  private[plans] def resolveGraftPath(session: SparkSession,
      parts: Seq[String]): String = {
    require(parts.size >= 2,
      s"expected <catalog>.<table>, got '${parts.mkString(".")}'")
    val cat = org.apache.spark.sql.graftbridge.Bridge
      .catalog(session, parts.head)
    cat match {
      case g: GraftCatalog =>
        val path = g.pathOf(Identifier.of(
          parts.slice(1, parts.size - 1).toArray, parts.last))
        require(Manifest.version(path) > 0,
          s"no committed version at $path")
        path
      case other => throw new UnsupportedOperationException(
        "OPTIMIZE/VACUUM/RESTORE are graft table-format maintenance " +
          s"operations; catalog '${parts.head}' is " +
          s"${other.getClass.getName}, not a GraftCatalog")
    }
  }

  private def out(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType, nullable = false)())

  val optimizeOutput: Seq[Attribute] =
    out("version", "files_rewritten", "files_carried")
  val vacuumOutput: Seq[Attribute] =
    out("versions_dropped", "files_deleted")
  val restoreOutput: Seq[Attribute] =
    out("version", "restored_to")
}

/** `OPTIMIZE graft.t [WHERE col BETWEEN lo AND hi | ZORDER BY (c1[,
  * c2])] [INTO n FILES]` → [[Layout.optimizeWhere]] (targeted — only
  * stats-intersecting files rewrite), [[Layout.optimizeZOrder]]
  * (clustering rewrite: range-sort for one column, Morton interleave
  * for two — box predicates prune afterwards), or [[Layout.compact]]
  * (whole-table bin-pack). All publish ONE `data_change=false` layout
  * commit: content provably unchanged, deletion vectors materialized
  * away, the relevant stats columns re-harvested so later range
  * probes keep pruning. */
case class GraftOptimizeCommand(nameParts: Seq[String],
    where: Option[(String, Double, Double)],
    zorder: Option[Seq[String]], numFiles: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.optimizeOutput
  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolveGraftPath(session, nameParts)
    val (v, rewritten, carried) = (where, zorder) match {
      case (Some((c, lo, hi)), _) =>
        Layout.optimizeWhere(session, path, c, lo, hi, numFiles)
      case (None, Some(cols)) =>
        Layout.optimizeZOrder(session, path, cols, numFiles)
      case (None, None) => Layout.compact(session, path, numFiles)
    }
    Seq(Row(v, rewritten.toLong, carried.toLong))
  }
}

/** `VACUUM graft.t RETAIN n VERSIONS` → [[Manifest.vacuum]]: drops
  * manifests and unreferenced data files beyond the horizon while
  * retaining everything tags, stages, and checkpoints still reference.
  * Returns (versions_dropped, files_deleted). */
case class GraftVacuumCommand(nameParts: Seq[String], retainLast: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.vacuumOutput
  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolveGraftPath(session, nameParts)
    val (versions, files) = Manifest.vacuum(path, retainLast)
    Seq(Row(versions.size.toLong, files.size.toLong))
  }
}

/** `RESTORE [TABLE] graft.t TO VERSION AS OF v` (or `TO TIMESTAMP AS
  * OF '…'`, resolved through the monotone-adjusted commit times) →
  * [[Manifest.restore]]: the METADATA-ONLY rollback — a new version
  * listing exactly the target's state; no data read or copied, history
  * keeps every intervening version. Returns (version, restored_to). */
case class GraftRestoreCommand(nameParts: Seq[String],
    toVersion: Option[Long], toTsMillis: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlParser.restoreOutput
  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolveGraftPath(session, nameParts)
    val target = toVersion.getOrElse(
      Manifest.versionAsOf(path, toTsMillis.get))
    val v = Manifest.restore(path, target)
    Seq(Row(v, target))
  }
}
