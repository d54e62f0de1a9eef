package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.cache.ParquetCache
import graft.model.{DrillStep, SeriesQuery}
import graft.ops.Relational

/** End-to-end pipeline semantics on reference-shaped fixtures (FIXTURES.md
  * §A): the BCRP lifecycle (validate → delta → ingest → pivot → upsert →
  * projected load, incl. the warm-cache second run fetching only the
  * delta — SURVEY §7.3), the INEI organize transforms, and MEF-as-rollup.
  */
/** MTC homologación stand-in transport: 47 rows of the reference table's
  * shape (row number, dd/MM/yyyy date, resolution id, company), 10 per
  * page — the `first_page` → page-count → fetch-all lifecycle's fixture. */
class MTCFixtureFetcher extends graft.sources.PageFetcher {
  import org.apache.spark.sql.types._
  override def schema: StructType = StructType(Seq(
    StructField("n", IntegerType), StructField("date", StringType),
    StructField("resolucion", StringType), StructField("empresa", StringType)))
  override def totalRows(): Long = 47L
  override def page(index: Int, pageSize: Int): Seq[Seq[Any]] =
    (index * pageSize until math.min((index + 1) * pageSize, 47)).map { i =>
      Seq(i + 1, f"${i % 28 + 1}%02d/${i % 12 + 1}%02d/2023",
        s"RD-$i-2023", s"EMPRESA ${i % 5}")
    }
}

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String = {
    val d = new java.io.File(s"target/scratch/spec_$name")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec); f.delete()
    }
    rec(d); d.mkdirs(); d.getPath
  }

  private def catalog = Seq(
    ("PN01234PM", "tipo de cambio", "M"),
    ("PN05678PM", "reservas internacionales", "M"),
    ("PD11111PD", "tasa interbancaria", "D")
  ).toDF("code", "description", "freq")

  test("BCRP lifecycle: validate, ingest, pivot, upsert, delta-only refetch") {
    val cache = new ParquetCache(spark, scratch("bcrp"))
    val pipe = new BCRPPipeline(spark, cache, catalog)
    val q1 = SeriesQuery(Seq("pn01234pm", "BOGUS1"), "2023-1", "2023-12")

    // validate returns DataFrames; the spec IS the application edge here.
    val (validDf, invalidDf) = pipe.validate(q1)
    val valid = validDf.collect().map(_.getString(0)).toSeq.sorted
    val invalid = invalidDf.collect().map(_.getString(0)).toSeq.sorted
    assert(valid == Seq("PN01234PM") && invalid == Seq("BOGUS1"))

    assert(pipe.search(Seq("CAMBIO", "reservas")).count() == 2)
    assert(pipe.search(Seq("tasa (x)")).count() == 0) // literal, not regex

    var fetched = Seq.empty[String]
    def fetch(codes: Seq[String]) = {
      fetched = codes
      Seq(("Ene.2023", codes.head, "3,400.50"), ("Feb.2023", codes.head, "n.d."))
        .toDF("date_str", "series", "value")
    }

    val r1 = pipe.fetchFrequency("M", q1.copy(codes = valid), fetch)
    assert(fetched == Seq("PN01234PM"))
    val rows = r1.orderBy("date").collect()
    assert(rows.map(_.getDate(0).toString).toSeq ==
      Seq("2023-01-01", "2023-02-01"))
    assert(rows(0).getDouble(1) == 3400.5 && rows(1).isNullAt(1))

    // Second run with a superset: only the NEW code is fetched (J5 delta).
    val q2 = SeriesQuery(Seq("PN01234PM", "PN05678PM"), "2023-1", "2023-12")
    val r2 = pipe.fetchFrequency("M", q2, fetch)
    assert(fetched == Seq("PN05678PM"))
    assert(r2.columns.toSeq == Seq("date", "PN01234PM", "PN05678PM"))
    assert(r2.count() == 2) // rows merged by date, not duplicated
  }

  test("searchCatalog: multi-term rank — both-terms row first, " +
    "then single-term rows by code; non-matches excluded") {
    val cache = new ParquetCache(spark, scratch("bcrp_search"))
    val pipe = new BCRPPipeline(spark, cache, Seq(
      ("PN01", "tipo de cambio interbancario", "M"),
      ("PN02", "tipo de interes de referencia", "M"),
      ("PN03", "indice de cambio real", "M"),
      ("PN04", "reservas internacionales", "M")
    ).toDF("code", "description", "freq"))
    val hits = pipe.searchCatalog(Seq("TIPO", "cambio")).collect()
      .map(r => (r.getAs[String]("code"), r.getAs[Int]("matched_terms")))
    assert(hits.toSeq == Seq(("PN01", 2), ("PN02", 1), ("PN03", 1)))
    assert(pipe.searchCatalog(Nil).isEmpty)
  }

  test("MTC homologacion: page-count lifecycle through the paged source, " +
    "cleanup drops the UI column, parses dates, newest first") {
    val raw = MTCHomologacion.fetch(spark,
      classOf[MTCFixtureFetcher].getName, pageSize = 10)
    // ceil(47 / 10) pages — the reference's first_page page-count rule,
    // here one InputPartition per page (cluster fan-out, not a thread pool)
    assert(raw.rdd.getNumPartitions == 5)
    val cleaned = MTCHomologacion.run(spark,
      classOf[MTCFixtureFetcher].getName, pageSize = 10)
    assert(cleaned.columns.toSeq == Seq("date", "resolucion", "empresa"))
    val rows = cleaned.collect()
    assert(rows.length == 47)
    val dates = rows.map(_.getDate(0).toLocalDate)
    assert(dates.zip(dates.tail).forall { case (a, b) => !a.isBefore(b) },
      "not sorted newest-first")
  }

  test("INEI organize: size rank, collision suffix, hash dedup") {
    val files = Seq(
      (2022, "0001", "by_module", "data_big.sav", 900L, "h1"),
      (2022, "0001", "by_module", "data_small.sav", 100L, "h2"),
      (2023, "0001", "by_module", "data.sav", 500L, "h3")
    ).toDF("year", "moduleCode", "folder", "fileName", "sizeBytes", "sha256")
    val ranked = INEIOrganize.rankDataFiles(files)
      .select("fileName", "organizedName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ranked("data_big.sav") == "2022_mod_0001_1")
    assert(ranked("data_small.sav") == "2022_mod_0001_2")
    assert(ranked("data.sav") == "2023_mod_0001_1")

    val docs = Seq(
      (2022, "0001", "docs", "readme.pdf", 10L, "d1"),
      (2023, "0002", "docs", "readme.pdf", 11L, "d2"),
      (2023, "0003", "docs", "other.pdf", 12L, "d1") // same content as d1
    ).toDF("year", "moduleCode", "folder", "fileName", "sizeBytes", "sha256")
    val suffixed = INEIOrganize.suffixCollisions(docs)
      .select("year", "organizedName").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(suffixed == Set((2022, "readme.pdf"), (2023, "readme.pdf_2"),
      (2023, "other.pdf")))

    val deduped = INEIOrganize.dedupDocs(docs).select("fileName")
      .collect().map(_.getString(0)).toSet
    assert(deduped == Set("other.pdf", "readme.pdf")) // d1 keeps smallest name
  }

  test("infogob locations: diagonal union, id cascade, modal cleaned names") {
    val f1 = Seq(
      ("R1", "P1", "D1", "Limá ", "Lima prov", "Miraflores"),
      ("R1", "P1", "D1", "LIMA", "Lima-prov", "Miraflores!"),
      ("R1", "P1", "D1", "lima", "LIMA PROV", "miraflores"),
      ("R1", null, null, "Lima", null, null)
    ).toDF("id_region", "id_provincia", "id_distrito", "region",
      "name_provincia", "name_distrito")
    // second frame misses name_distrito entirely (diagonal union)
    val f2 = Seq(("R2", "P9", "D9", "Cuzco", "Cusco prov"))
      .toDF("id_region", "id_provincia", "id_distrito", "region",
        "name_provincia")

    val out = InfogobLocations.consolidate(Seq(f1, f2))
      .orderBy(col("id_region"), col("id_provincia"), col("id_distrito"))
      .collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
      (r.getString(3), r.getString(4), r.getString(5))).toMap
    // "LIMA" appears 3/4 times after cleaning; provincia variants all clean
    // to "LIMA PROV"; null keys group together like pandas dropna=False.
    assert(byKey(("R1", "P1", "D1")) == (("LIMA", "LIMA PROV", "MIRAFLORES")))
    assert(byKey(("R1", null, null)) == (("LIMA", null, null)))
    assert(byKey(("R2", "P9", "D9")) == (("CUZCO", "CUSCO PROV", null)))

    val cascade = Relational.unionDiagonal(Seq(f1, f2))
      .withColumn("id_location_req", InfogobLocations.locationRequestId)
      .select("id_location_req").collect().map(_.getString(0)).toSet
    assert(cascade == Set("D1", "R1", "D9"))
  }

  test("MEF workflow parser reproduces the reference contract pair exactly") {
    import graft.model.MefStep
    import graft.model.MefToken._
    import MEFWorkflow.buttons._
    // the reference's own input/output fixture, workflow.py:70-124
    val input = Seq(
      Rows(Seq("total")), ClickBtn(NivelGobierno),
      Rows(Seq("locales")), ClickBtn(GobLocalesMancomunidades),
      Rows(Seq("municipalidades")), ClickBtn(Generica),
      Rows(), ClickBtn(Departamento), SavePartial(Some("departamento")),
      Rows(Seq("ica", "junin", "piura")), ClickBtn(Municipalidad),
      Search("provincial"))
    val out = MEFWorkflow.parse(input)
    assert(out == Seq(
      MefStep(Rows(Seq("total")), ClickBtn(NivelGobierno)),
      MefStep(Rows(Seq("locales")), ClickBtn(GobLocalesMancomunidades)),
      MefStep(Rows(Seq("municipalidades")), ClickBtn(Generica)),
      MefStep(Rows(), ClickBtn(Departamento),
        save = Some(SavePartial(Some("departamento")))),
      MefStep(Rows(Seq("ica", "junin", "piura")), ClickBtn(Municipalidad),
        search = Some(Search("provincial")))))
    // drill-column names derive from the control ids' Btn suffix
    assert(out.map(_.click.name) == Seq("TipoGobierno", "SubTipoGobierno",
      "Generica", "Departamento", "Municipalidad"))
    // parser contract failures (workflow.py:38-41 block must start with
    // Rows; :62-63 block must contain a ClickBtn)
    val e1 = intercept[IllegalArgumentException](
      MEFWorkflow.parse(Seq(ClickBtn(Generica))))
    assert(e1.getMessage.contains("position 0"))
    val e2 = intercept[IllegalArgumentException](
      MEFWorkflow.parse(Seq(Rows(Seq("x")))))
    assert(e2.getMessage.contains("no ClickBtn"))
    // later tokens of a block overwrite by type (last ClickBtn wins)
    assert(MEFWorkflow.parse(Seq(Rows(), ClickBtn(Generica),
      ClickBtn(Departamento))).head.click == ClickBtn(Departamento))
  }

  test("parsed MEF workflow lowers to one declarative drill plan " +
    "(block k+1's Rows filter level k's values)") {
    import graft.model.MefToken._
    import MEFWorkflow.buttons._
    val steps = MEFWorkflow.parse(Seq(
      Rows(Seq("total")), ClickBtn(NivelGobierno),
      Rows(Seq("locales")), ClickBtn(GobLocalesMancomunidades),
      Rows(Seq("municipalidades")), ClickBtn(Generica),
      Rows(), ClickBtn(Departamento),
      Rows(Seq("ica", "junin", "piura")), ClickBtn(Municipalidad)))
    assert(MEFWorkflow.toDrillSteps(steps) == Seq(
      DrillStep("TipoGobierno", Some("locales")),
      DrillStep("SubTipoGobierno", Some("municipalidades")),
      DrillStep("Generica", None),
      DrillStep("Departamento", Some("ica|junin|piura")),
      DrillStep("Municipalidad", None)))
    val fact = Seq(
      ("gobiernos locales", "municipalidades", "personal", "ica",
        "mun prov ica", 10.0),
      ("gobiernos locales", "municipalidades", "personal", "lima",
        "mun metropolitana", 99.0), // filtered: lima not in the Rows list
      ("gobierno nacional", "-", "personal", "-", "-", 5.0) // not "locales"
    ).toDF("TipoGobierno", "SubTipoGobierno", "Generica", "Departamento",
      "Municipalidad", "devengado")
    val leaf = MEFWorkflow.run(fact, steps, Seq("devengado")).collect()
    assert(leaf.length == 1)
    assert(leaf.head.getAs[String]("Departamento") == "ica")
    assert(leaf.head.getAs[Double]("devengado") == 10.0)
  }

  test("MEF Search step delegates to the PagedSource panel above the " +
    "400-row threshold (description contains + code exact)") {
    import graft.model.MefToken._
    import graft.sources.{PagedSource, SearchableFixtureFetcher}
    val steps = MEFWorkflow.parse(Seq(
      Rows(), ClickBtn(MEFWorkflow.buttons.Municipalidad),
      Search("group 3")))
    def level = spark.read.format(classOf[PagedSource].getName)
      .option("fetcher", classOf[SearchableFixtureFetcher].getName)
      .option("pageSize", "100").load()
    // description search: the >400-row level delegates the contains to the
    // remote panel and fetches only the matching subset
    SearchableFixtureFetcher.served.set(0)
    val byDesc = level.filter(
      MEFWorkflow.searchPredicate(steps.head.search.get, "descr", "code"))
    val got = byDesc.collect().map(_.getLong(0)).toSet
    val expect = (0 until SearchableFixtureFetcher.Total)
      .filter(i => SearchableFixtureFetcher.descrOf(i).contains("group 3"))
      .map(_.toLong).toSet
    assert(got == expect)
    assert(byDesc.queryExecution.executedPlan.toString
      .contains("pushedSearch=[description(descr"))
    assert(SearchableFixtureFetcher.served.get == expect.size.toLong)
    // code search: exact match delegates as the code lookup
    val byCode = level.filter(
      MEFWorkflow.searchPredicate(Search("C0042", "code"), "descr", "code"))
    assert(byCode.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(byCode.queryExecution.executedPlan.toString
      .contains("pushedSearch=[code(code"))
  }

  test("MEF drill-down: filter + grouped measures and rollup totals") {
    val fact = Seq(
      ("gobierno nacional", "personal", 100.0, 90.0),
      ("gobierno nacional", "bienes", 50.0, 40.0),
      ("gobiernos locales", "personal", 30.0, 20.0)
    ).toDF("nivel", "generica", "pia", "devengado")
    val steps = Seq(DrillStep("nivel", Some("nacional")), DrillStep("generica"))

    val leaf = MEFDrilldown.run(fact, steps, Seq("pia", "devengado"))
      .orderBy("generica").collect()
    assert(leaf.map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq == Seq(("bienes", 50.0, 40.0), ("personal", 100.0, 90.0)))

    val roll = MEFDrilldown.rollupAll(fact, steps.map(_.copy(keepMatching = None)),
        "pia")
      .filter(col("gid") === 3).collect() // grand total row
    assert(roll.length == 1 && roll.head.getAs[Double]("pia") == 180.0)
  }

  test("BCRP backup runner: one partition dir per grupo_file, rows " +
    "filtered to the group's embedded frequency") {
    val out = scratch("bcrp_backup")
    val catalog = Seq(
      ("PN01", "gdp_M_nominal"), ("PN02", "gdp_M_nominal"),
      ("PN03", "prices_Q_index")).toDF("codigo", "grupo_file")
    val data = Seq(
      // PN01/PN02 publish monthly AND an unwanted annual series; PN03
      // quarterly only — the freq rule must keep exactly the matches
      ("PN01", "M", "2023-01", 1.0), ("PN01", "A", "2023", 99.0),
      ("PN02", "M", "2023-01", 2.0),
      ("PN03", "Q", "2023-Q1", 3.0), ("PN03", "M", "2023-01", 98.0))
      .toDF("codigo", "freq", "period", "value")
    val back = BCRPBackup.export(catalog, data, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("grupo_file=gdp_M_nominal",
      "grupo_file=prices_Q_index"), dirs.toSeq)
    val rows = back.select("codigo", "grupo_file", "value")
      .orderBy("codigo").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("PN01", "gdp_M_nominal", 1.0), ("PN02", "gdp_M_nominal", 2.0),
      ("PN03", "prices_Q_index", 3.0)), rows.toSeq)
  }
}
