package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Column functions whose outputs are pinned to the reference's exact
  * behavior on tricky inputs (verified against the Python implementations).
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private def run1(c: org.apache.spark.sql.Column, input: String): Any = {
    val r = Seq(input).toDF("s").select(c).collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("mefNumeric: regex-guarded conversion (MEF tables.py:59-65)") {
    assert(run1(numeric.mefNumeric(col("s")), "3,400,841.50") == 3400841.5)
    assert(run1(numeric.mefNumeric(col("s")), "1200") == 1200.0)
    assert(run1(numeric.mefNumeric(col("s")), "7%") == null) // gate rejects
    assert(run1(numeric.mefNumeric(col("s")), "1.2.3") == null)
    assert(run1(numeric.mefNumeric(col("s")), "abc") == null)
  }

  test("cleanSeriesDescription strips the catalog series-count suffix") {
    assert(run1(text.cleanSeriesDescription(col("s")),
      "Tipo de  cambio   - (4 series) mensual") == "Tipo de cambio")
    assert(run1(text.cleanSeriesDescription(col("s")),
      "  Reservas internacionales  ") == "Reservas internacionales")
  }

  test("containsAnyLiteral escapes regex metacharacters") {
    val df = Seq("GASTO (a.b)", "gasto total", "otro").toDF("s")
    val hits = df.filter(text.containsAnyLiteral(col("s"), Seq("(a.b)", "TOTAL")))
      .collect().map(_.getString(0)).toSet
    assert(hits == Set("GASTO (a.b)", "gasto total"))
    // an unescaped "." would also match "gasto total"; "(a.b)" must not
    assert(!df.filter(text.containsAnyLiteral(col("s"), Seq("(axb)")))
      .collect().map(_.getString(0)).contains("GASTO (a.b)"))
  }
}
