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

/** DataSource V2 provider for paged remote sources (SURVEY §2.1 S1/S11):
  * the reference fetches pages sequentially (or via a 10-thread pool,
  * `perustats/MTC/homologacion.py:38-95`); here EVERY PAGE IS AN
  * InputPartition, so the fetch fans out across the cluster and scales with
  * executors rather than one driver's thread pool. Column pruning is pushed
  * into the reader (pages project before emitting rows).
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedScan(full, required, options)
}

private[sources] class PagedScan(full: StructType, required: StructType,
    options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

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
