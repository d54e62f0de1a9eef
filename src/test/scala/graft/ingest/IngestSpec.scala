package graft.ingest

import graft.SparkSpec

/** Ingest-edge parse logic, offline (transport injected). The HTML fixture
  * mirrors the reference's own inline test table
  * (`perustats/MEF/utils/tables.py:120-160` — semantics only). */
class IngestSpec extends SparkSpec {

  private val html =
    """<table class="Data">
      |<tr><th>Nivel</th><th>PIA</th></tr>
      |<tr><td><b>GOBIERNO&nbsp;NACIONAL</b></td><td>3,400,841.50</td></tr>
      |<tr><td>GOBIERNOS LOCALES</td><td>1,200.00</td></tr>
      |</table>""".stripMargin

  test("parseHtmlTable strips tags, entities, whitespace") {
    val rows = ingest.parseHtmlTable(html)
    assert(rows == Seq(
      Seq("Nivel", "PIA"),
      Seq("GOBIERNO NACIONAL", "3,400,841.50"),
      Seq("GOBIERNOS LOCALES", "1,200.00")))
  }

  test("htmlTableToDf yields typed-string frame; tryNumeric coerces") {
    import org.apache.spark.sql.functions.col
    val df = ingest.htmlTableToDf(spark, html, Seq("nivel", "pia"))
    assert(df.count() == 2)
    val vals = df.select(graft.functions.numeric.tryNumeric(col("pia")))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(vals == Seq(1200.0, 3400841.5))
  }

  test("pagedFetch derives page count from the first page's total") {
    var calls = Vector.empty[Int]
    val rows = ingest.pagedFetch[Int](
      p => { calls :+= p; Seq.fill(10)(p) }, _ => 25L, pageSize = 10)
    assert(calls == Vector(1, 2, 3))
    assert(rows.length == 30 && rows.distinct == Seq(1, 2, 3))
  }

  test("isZipValid accepts a real empty zip, rejects garbage") {
    val out = new java.io.ByteArrayOutputStream()
    new java.util.zip.ZipOutputStream(out).close()
    assert(ingest.isZipValid(out.toByteArray))
    assert(!ingest.isZipValid("PKnot-a-zip-at-all-no-eocd".getBytes))
    assert(!ingest.isZipValid(Array[Byte](1, 2, 3)))
  }

  test("CSV latin-1 sink/source round-trips accented text byte-faithfully") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = "target/scratch/csv_latin1"
    val df = Seq((1, "Ñandú"), (2, "café"), (3, "ASCII")).toDF("id", "name")
    df.write.mode("overwrite").option("header", "true")
      .option("encoding", "ISO-8859-1").csv(dir)
    // the file on disk must be latin-1 bytes (Ñ = 0xD1), not UTF-8 (0xC3 …)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => java.nio.file.Files.readAllBytes(f.toPath))
    assert(bytes.contains(0xD1.toByte) && !bytes.contains(0xC3.toByte))
    val back = spark.read
      .schema(StructType(Seq(StructField("id", IntegerType),
        StructField("name", StringType))))
      .option("header", "true").option("encoding", "ISO-8859-1").csv(dir)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(back == Seq("Ñandú", "café", "ASCII"))
  }

  test("urlEncode is charset-faithful (latin-1 vs utf-8 differ on ñ)") {
    assert(ingest.urlEncode("año 1") == "a%F1o%201")
    assert(ingest.urlEncode("año 1", "UTF-8") == "a%C3%B1o%201")
    assert(ingest.urlEncode("safe-._~chars") == "safe-._~chars")
  }
}
