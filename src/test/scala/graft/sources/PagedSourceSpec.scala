package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Deterministic in-JVM fetcher standing in for an HTTP transport: 47 rows
  * of (id, name), 10 per page. */
class FixturePageFetcher extends PageFetcher {
  override def schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  override def totalRows(): Long = 47L
  override def page(index: Int, pageSize: Int): Seq[Seq[Any]] =
    (index * pageSize until math.min((index + 1) * pageSize, 47))
      .map(i => Seq(i.toLong, s"row_$i"))
}

/** Searchable stand-in for the MEF "Consulta Amigable" Search panel: 1000
  * rows of (id, code, descr); a delegated search filters server-side before
  * paging. Rows served are counted so specs can assert the pushdown
  * actually narrowed the fetch. */
class SearchableFixtureFetcher extends SearchablePageFetcher {
  import SearchableFixtureFetcher._
  private var ids: IndexedSeq[Int] = 0 until Total

  override def searchableColumns: Set[String] = Set("code", "descr")

  override def init(options: Map[String, String]): Unit =
    (options.get("search.column"), options.get("search.query")) match {
      case (Some(c), Some(q)) =>
        ids = (0 until Total).filter(i =>
          if (c == "code") codeOf(i) == q else descrOf(i).contains(q))
      case _ => ()
    }

  override def schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("code", StringType),
    StructField("descr", StringType)))
  override def totalRows(): Long = ids.size.toLong
  override def page(index: Int, pageSize: Int): Seq[Seq[Any]] = {
    val slice = ids.slice(index * pageSize, (index + 1) * pageSize)
    served.addAndGet(slice.size.toLong)
    slice.map(i => Seq(i.toLong, codeOf(i), descrOf(i)))
  }
}

object SearchableFixtureFetcher {
  val Total = 1000
  def codeOf(i: Int): String = f"C$i%04d"
  def descrOf(i: Int): String = s"item $i group ${i % 7}"
  val served = new java.util.concurrent.atomic.AtomicLong()
}

class PagedSourceSpec extends SparkSpec {

  private def read = spark.read
    .format(classOf[PagedSource].getName)
    .option("fetcher", classOf[FixturePageFetcher].getName)
    .option("pageSize", "10").load()

  private def readSearchable(extra: (String, String)*) = {
    val base = spark.read
      .format(classOf[PagedSource].getName)
      .option("fetcher", classOf[SearchableFixtureFetcher].getName)
      .option("pageSize", "100")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("reads all pages in parallel partitions") {
    val df = read
    assert(df.count() == 47)
    assert(df.rdd.getNumPartitions == 5) // one InputPartition per page
    assert(df.agg(sum(col("id"))).collect().head.getLong(0) == (0 until 47).sum)
    assert(df.filter(col("id") === 13).collect().head.getString(1) == "row_13")
  }

  test("column pruning reaches the reader") {
    val df = read.select("name")
    assert(df.schema.fieldNames.toSeq == Seq("name"))
    assert(df.distinct().count() == 47)
    val scan = df.queryExecution.executedPlan.toString
    assert("BatchScan [^\\[\\n]*\\[name#\\d+\\]".r.findFirstIn(scan).isDefined, scan)
  }

  test("search pushdown: exact code predicate delegates, narrows the fetch") {
    SearchableFixtureFetcher.served.set(0)
    val df = readSearchable().filter(col("code") === "C0042")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(42L))
    assert(df.queryExecution.executedPlan.toString
      .contains("pushedSearch=[code(code"))
    // one matching row fetched — not the 1000-row level
    assert(SearchableFixtureFetcher.served.get == 1L,
      s"served ${SearchableFixtureFetcher.served.get}")
  }

  test("search pushdown: contains predicate delegates as description " +
    "search; Spark still re-filters (residual), so results stay exact") {
    SearchableFixtureFetcher.served.set(0)
    val df = readSearchable().filter(col("descr").contains("group 3"))
    val got = df.collect().map(_.getLong(0)).toSet
    val expect = (0 until SearchableFixtureFetcher.Total)
      .filter(i => SearchableFixtureFetcher.descrOf(i).contains("group 3"))
      .map(_.toLong).toSet
    assert(got == expect)
    assert(df.queryExecution.executedPlan.toString
      .contains("pushedSearch=[description(descr"))
    assert(SearchableFixtureFetcher.served.get == expect.size.toLong)
  }

  test("no delegation below the panel threshold or for non-searchable " +
    "columns; results identical either way") {
    SearchableFixtureFetcher.served.set(0)
    // threshold above the level size -> the panel would not exist
    val small = readSearchable("searchThreshold" -> "5000")
      .filter(col("code") === "C0042")
    assert(small.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(small.queryExecution.executedPlan.toString
      .contains("pushedSearch=[none]"))
    assert(SearchableFixtureFetcher.served.get ==
      SearchableFixtureFetcher.Total.toLong) // full fetch, Spark filters
    // a predicate on a non-searchable column cannot delegate
    val nonSearch = readSearchable().filter(col("id") > 990)
    assert(nonSearch.count() == 9)
    assert(nonSearch.queryExecution.executedPlan.toString
      .contains("pushedSearch=[none]"))
  }
}
