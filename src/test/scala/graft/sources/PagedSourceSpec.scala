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

class PagedSourceSpec extends SparkSpec {

  private def read = spark.read
    .format(classOf[PagedSource].getName)
    .option("fetcher", classOf[FixturePageFetcher].getName)
    .option("pageSize", "10").load()

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
}
