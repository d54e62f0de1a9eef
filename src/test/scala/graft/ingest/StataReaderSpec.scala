package graft.ingest

import org.apache.spark.sql.types._
import graft.SparkSpec

/** S10: Stata `.dta` v114 ingest against a pandas-written fixture — the
  * same producer the reference's INEI notebooks round-trip through. Covers
  * type mapping, latin-1 strings, missing-value codes → nulls, and the
  * edge values just below each missing threshold (which must stay valid).
  */
class StataReaderSpec extends SparkSpec {

  private def fixture: String =
    getClass.getResource("/fixtures/sample.dta").getPath

  test("readDta maps v114 types to Spark types") {
    val df = StataReader.readDta(spark, fixture)
    assert(df.schema == StructType(Seq(
      StructField("anio", IntegerType),
      StructField("codigo", IntegerType),
      StructField("gasto", DoubleType),
      StructField("peso", FloatType),
      StructField("region", StringType),
      StructField("flag", IntegerType))))
  }

  test("readDta decodes values, missing codes become nulls") {
    val df = StataReader.readDta(spark, fixture)
    val rows = df.collect().sortBy(_.getInt(1))
    assert(rows.length == 4)
    val r1 = rows(0) // codigo 101
    assert(r1.getInt(0) == 2021 && r1.getDouble(2) == 1234.5 &&
      r1.getFloat(3) == 1.5f && r1.getString(4) == "Lima" && r1.getInt(5) == 1)
    assert(rows(1).isNullAt(2)) // gasto NaN -> Stata missing -> null
    assert(rows(2).isNullAt(3)) // peso NaN -> missing -> null
    assert(rows(2).getString(4) == "") // empty string passes through
    val edge = rows(3) // largest valid long + largest valid byte
    assert(edge.getInt(1) == 2147483620 && edge.getInt(5) == 100)
  }

  test("readDtaFiles distributes the parse and matches the local read") {
    val local = StataReader.readDta(spark, fixture)
      .collect().map(_.toSeq).toSet
    val dist = StataReader.readDtaFiles(spark, fixture)
      .collect().map(_.toSeq).toSet
    assert(dist == local && dist.size == 4)
  }

  test("rejects unsupported versions loudly") {
    val bogus = new Array[Byte](200)
    bogus(0) = 117.toByte
    val e = intercept[IllegalArgumentException] {
      StataReader.layout(bogus)
    }
    assert(e.getMessage.contains("114"))
  }
}
