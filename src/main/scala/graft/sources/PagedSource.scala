package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A paged-fetch contract: total row count + one page of rows at a time.
  * Implementations must have a public no-arg constructor — executors
  * instantiate them reflectively from the class name in the read options,
  * so nothing needs to be serialized (a production implementation holds an
  * HTTP client + URL template built from `init` options). */
trait PageFetcher {
  def init(options: Map[String, String]): Unit = {}
  def schema: StructType
  def totalRows(): Long
  /** 0-based page of rows, each row positionally matching [[schema]].
    * Strings as String, ints as Int/Long — converted by the reader. */
  def page(index: Int, pageSize: Int): Seq[Seq[Any]]
}

/** A paged fetcher whose remote service can evaluate ONE predicate
  * server-side — the MEF "Consulta Amigable" Search panel, which appears
  * once a level exceeds ~400 rows and filters by description (contains) or
  * code (exact) before paging (`perustats/MEF/steps/click.py:58-67`,
  * `perustats/MEF/scrapper.py:100-127`). The delegated search travels in
  * the read OPTIONS (`search.column` / `search.query` / `search.method`),
  * so the reflectively-built executor fetchers replay it in `init` and
  * their `totalRows()`/`page()` then describe the FILTERED result. */
trait SearchablePageFetcher extends PageFetcher {
  /** Columns the remote search panel can filter on. */
  def searchableColumns: Set[String]
}

/** DataSource V2 provider for paged remote sources (SURVEY §2.1 S1/S11):
  * the reference fetches pages sequentially (or via a 10-thread pool,
  * `perustats/MTC/homologacion.py:38-95`); here EVERY PAGE IS AN
  * InputPartition, so the fetch fans out across the cluster and scales with
  * executors rather than one driver's thread pool. Column pruning is pushed
  * into the reader (pages project before emitting rows), and for a
  * [[SearchablePageFetcher]] one eligible predicate is pushed to the remote
  * service (`SupportsPushDownFilters`) once the unfiltered row count
  * crosses `searchThreshold` (default 400, the MEF panel's appearance
  * rule) — the fetch then pages over the server-filtered subset instead of
  * shipping every row to be filtered Spark-side.
  *
  *   spark.read.format("graft.sources.PagedSource")
  *     .option("fetcher", classOf[MyFetcher].getName)
  *     .option("pageSize", "1000").load()
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.fetcher(options.asCaseSensitiveMap().asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(schema, properties.asScala.toMap)
}

object PagedSource {
  def fetcher(options: Map[String, String]): PageFetcher = {
    val cls = options.getOrElse("fetcher",
      throw new IllegalArgumentException("option 'fetcher' is required"))
    val f = Class.forName(cls).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]
    f.init(options)
    f
  }
}

private[sources] class PagedTable(tableSchema: StructType,
    options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"paged(${options.getOrElse("fetcher", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(tableSchema, options)
}

private[sources] class PagedScanBuilder(full: StructType,
    options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, StringContains}

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var searchOpts: Map[String, String] = Map.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Delegate ONE predicate to the remote search panel (it has one search
    * box): EqualTo maps to the exact `code` search, StringContains to the
    * `description` search. ALL filters are returned as residuals — Spark
    * re-evaluates them over the fetched rows, so correctness never depends
    * on the remote service's matching semantics (case/diacritic folding);
    * the pushdown only narrows what gets fetched. No delegation below the
    * threshold: the panel does not exist for small levels, and a full
    * fetch of ≤400 rows costs less than a search round-trip. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val threshold = options.getOrElse("searchThreshold", "400").toLong
    PagedSource.fetcher(options) match {
      case s: SearchablePageFetcher if s.totalRows() > threshold =>
        filters.collectFirst {
          case f @ EqualTo(c, v: String) if s.searchableColumns(c) =>
            (f, c, v, "code")
          case f @ StringContains(c, v) if s.searchableColumns(c) =>
            (f, c, v, "description")
        }.foreach { case (f, c, v, m) =>
          pushed = Array(f)
          searchOpts = Map("search.column" -> c, "search.query" -> v,
            "search.method" -> m)
        }
      case _ => ()
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PagedScan(full, required,
    options ++ searchOpts)
}

private[sources] class PagedScan(full: StructType, required: StructType,
    options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = {
    val search = options.get("search.column")
      .map(c => s"${options.getOrElse("search.method", "?")}($c ~ " +
        s"${options.getOrElse("search.query", "")})").getOrElse("none")
    s"PagedScan pushedSearch=[$search]"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val pageSize = options.getOrElse("pageSize", "1000").toInt
    val total = PagedSource.fetcher(options).totalRows() // one metadata call
    val pages = math.ceil(total.toDouble / pageSize).toInt
    (0 until pages).map(PagePartition(_, pageSize): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(full, required, options)
}

private[sources] case class PagePartition(index: Int, pageSize: Int)
    extends InputPartition

private[sources] class PagedReaderFactory(full: StructType,
    required: StructType, options: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val projection = required.fields.map(f => full.fieldIndex(f.name))
      private lazy val rows = PagedSource.fetcher(options)
        .page(part.index, part.pageSize).iterator
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow = {
        val r = rows.next()
        InternalRow.fromSeq(projection.toSeq.map(i => convert(r(i))))
      }
      override def close(): Unit = {}
    }
  }

  private def convert(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case other => other
  }
}
