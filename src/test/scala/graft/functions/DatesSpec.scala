package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatesSpec extends SparkSpec {
  import spark.implicits._

  private def parse(freq: String, s: String): String = {
    Seq(s).toDF("s")
      .select(dates.bcrpDate(freq, col("s")).cast("string"))
      .as[String].head()
  }

  test("D: Spanish day labels") {
    assert(parse("D", "15.Ene.23") === "2023-01-15")
    assert(parse("D", "03.Set.21") === "2021-09-03")
    // pandas %y pivots at 69: 99 -> 1999, 68 -> 2068 (verified against
    // pd.to_datetime; Spark's raw `yy` pattern would give 2099).
    assert(parse("D", "29.Dic.99") === "1999-12-29")
    assert(parse("D", "05.Ene.69") === "1969-01-05")
    assert(parse("D", "05.Ene.68") === "2068-01-05")
  }

  test("M: month start (pandas to_datetime semantics)") {
    assert(parse("M", "Ene.2023") === "2023-01-01")
    assert(parse("M", "Ago.1999") === "1999-08-01")
  }

  test("Q: end-of-quarter + yq label") {
    assert(parse("Q", "Q1.23") === "2023-03-31")
    assert(parse("Q", "Q4.09") === "2009-12-31")
    val yq = Seq("Q2.23").toDF("s")
      .select(dates.yqLabel(dates.bcrpDate("Q", col("s")))).as[String].head()
    assert(yq === "2023Q2")
  }

  test("A: year start") {
    assert(parse("A", "2023") === "2023-01-01")
  }

  test("apiDateFormat per frequency") {
    val d = Seq("2023-06-15").toDF("s").select(col("s").cast("date").as("d"))
    def fmt(freq: String): String =
      d.select(dates.apiDateFormat(freq, col("d"))).as[String].head()
    assert(fmt("D") === "2023-06-15")
    assert(fmt("M") === "2023-6")
    assert(fmt("Q") === "2023-2")
    assert(fmt("A") === "2023")
  }
}
