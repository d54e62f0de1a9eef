package graft.cache

import java.sql.Date

import graft.SparkSpec

/** JDBC (embedded Derby) engine behind the SeriesCache contract: the same
  * lifecycle ParquetCacheSpec pins — save, footer/metadata-only code
  * listing, projected load, delta probe, schema-evolving upsert — plus the
  * BCRP pipeline running unchanged over the JDBC engine.
  */
class JdbcCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(name: String): String = {
    val dir = new java.io.File(s"target/scratch/derby_$name")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec); f.delete()
    }
    rec(dir)
    s"jdbc:derby:${dir.getPath};create=true"
  }

  private def wide(rows: Seq[(String, Option[Double])], code: String) =
    rows.map { case (d, v) => (Date.valueOf(d), v) }.toDF("date", code)

  test("save/load lifecycle with schema evolution and delta probe") {
    val cache = new JdbcCache(spark, freshUrl("lifecycle"))
    assert(cache.cachedCodes("M", "2023-1", "2023-12").isEmpty)
    assert(cache.missingCodes("M", "2023-1", "2023-12", Seq("A1", "B2")) ==
      Seq("A1", "B2"))

    cache.save("M", "2023-1", "2023-12",
      wide(Seq("2023-01-01" -> Some(3400.5), "2023-02-01" -> None), "A1"))
    assert(cache.cachedCodes("M", "2023-1", "2023-12") == Seq("A1"))
    assert(cache.missingCodes("M", "2023-1", "2023-12", Seq("a1", "B2")) ==
      Seq("B2"))

    // second save: new code -> new column; overlapping date row merges
    cache.save("M", "2023-1", "2023-12",
      wide(Seq("2023-02-01" -> Some(7.25), "2023-03-01" -> Some(8.0)), "B2"))
    assert(cache.cachedCodes("M", "2023-1", "2023-12").sorted ==
      Seq("A1", "B2"))

    val all = cache.load("M", "2023-1", "2023-12", Seq("A1", "B2"))
      .orderBy("date").collect()
    assert(all.length == 3) // dates merged, not duplicated
    assert(all(0).getDouble(1) == 3400.5 && all(0).isNullAt(2))
    assert(all(1).isNullAt(1) && all(1).getDouble(2) == 7.25)

    // projected load only returns the requested column
    val proj = cache.load("M", "2023-1", "2023-12", Seq("B2"))
    assert(proj.columns.toSeq == Seq("date", "B2"))
  }

  test("BCRP pipeline runs unchanged over the JDBC engine") {
    import graft.model.SeriesQuery
    import graft.pipelines.BCRPPipeline
    val catalog = Seq(("PN01234PM", "tipo de cambio", "M"))
      .toDF("code", "description", "freq")
    val pipe = new BCRPPipeline(spark, new JdbcCache(spark, freshUrl("bcrp")),
      catalog)
    var fetched = Seq.empty[String]
    def fetch(codes: Seq[String]) = {
      fetched = codes
      Seq(("Ene.2023", codes.head, "3,400.50"), ("Feb.2023", codes.head, "n.d."))
        .toDF("date_str", "series", "value")
    }
    val q = SeriesQuery(Seq("PN01234PM"), "2023-1", "2023-12")
    val r1 = pipe.fetchFrequency("M", q, fetch)
    assert(fetched == Seq("PN01234PM"))
    val rows = r1.orderBy("date").collect()
    assert(rows.map(_.getDate(0).toString).toSeq ==
      Seq("2023-01-01", "2023-02-01"))
    assert(rows(0).getDouble(1) == 3400.5 && rows(1).isNullAt(1))
    // warm cache: nothing refetched
    fetched = Seq("sentinel")
    pipe.fetchFrequency("M", q, fetch)
    assert(fetched == Seq("sentinel"))
  }
}
