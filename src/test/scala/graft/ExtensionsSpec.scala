package graft

/** graft's custom expressions must be reachable from plain SQL once the
  * extension is installed (live-session path; the construction-time path
  * uses the identical function list). */
class ExtensionsSpec extends SparkSpec {

  test("installed SQL functions evaluate like their Column twins") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT slugify('Ñandú  Café!'), strip_accents('ñandú'), " +
        "rolling_hash('abc'), dot_product(array(1.0F, 2.0F), array(3.0D, 4.0D))")
      .collect().head
    assert(row.getString(0) == "nandu_cafe")
    assert(row.getString(1) == "nandu")
    assert(row.getLong(2) == 96354L) // matches the DuckDB list_reduce fold
    assert(row.getDouble(3) == 11.0)
  }
}
