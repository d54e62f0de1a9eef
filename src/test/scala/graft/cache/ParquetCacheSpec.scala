package graft.cache

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ParquetCacheSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): ParquetCache = {
    val d = new java.io.File(s"target/scratch/cache_$name")
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec); f.delete()
    }
    rec(d)
    new ParquetCache(spark, d.getPath)
  }

  test("cachedCodes/missingCodes: empty cache, then delta after save") {
    val c = fresh("delta")
    assert(c.cachedCodes("M", "2020", "2021").isEmpty)
    assert(c.missingCodes("M", "2020", "2021", Seq("A1", "B2")) == Seq("A1", "B2"))
    c.save("M", "2020", "2021",
      Seq(("2020-01-01", 1.0)).toDF("date", "A1"))
    assert(c.cachedCodes("M", "2020", "2021") == Seq("A1"))
    // case-insensitive delta, preserves request order
    assert(c.missingCodes("M", "2020", "2021", Seq("a1", "B2")) == Seq("B2"))
  }

  test("saves are versioned; load ignores unknown codes; incoming wins") {
    val c = fresh("versioned")
    c.save("Q", "2020", "2021", Seq(("2020-03-31", 1.0)).toDF("date", "A1"))
    c.save("Q", "2020", "2021",
      Seq(("2020-03-31", 9.0, 5L), ("2020-06-30", 2.0, 6L))
        .toDF("date", "A1", "B2"))
    val out = c.load("Q", "2020", "2021", Seq("A1", "B2", "NOPE"))
      .orderBy("date").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("2020-03-31", "2020-06-30"))
    assert(out.map(_.getDouble(1)).toSeq == Seq(9.0, 2.0)) // incoming won
    assert(out.map(_.getLong(2)).toSeq == Seq(5L, 6L)) // schema evolved
    // both versions exist on disk; _CURRENT points at v1
    val dir = new java.io.File(s"target/scratch/cache_versioned")
      .listFiles().find(_.getName.startsWith("sr_Q")).get
    assert(new java.io.File(dir, "v0").exists && new java.io.File(dir, "v1").exists)
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_CURRENT").toPath)).trim == "v1")
  }

  test("concurrent saves: readers never see a partial version") {
    val c = fresh("race")
    c.save("M", "2019", "2022", Seq(("2019-01-01", 0.0)).toDF("date", "SEED"))
    // 4 writers × distinct code columns racing the same table, while a
    // reader loop keeps loading: every load must observe a COMPLETE
    // version — the seed column present and exactly one value per date —
    // and no load may throw (a torn _CURRENT or half-renamed vN would).
    val codes = Seq("W1", "W2", "W3", "W4")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!done.get) {
        try {
          val rows = c.load("M", "2019", "2022", Seq("SEED") ++ codes)
            .collect()
          assert(rows.nonEmpty)
          assert(rows.map(_.getString(0)).distinct.length == rows.length)
        } catch { case t: Throwable => errs.add(t); done.set(true) }
      }
    })
    reader.start()
    val writers = codes.zipWithIndex.map { case (code, i) =>
      new Thread(() => {
        try c.save("M", "2019", "2022",
          Seq((s"2020-0${i + 1}-01", 1.0)).toDF("date", code))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    done.set(true); reader.join()
    assert(errs.isEmpty, errs.toArray.mkString("\n"))
    // the table dir holds only complete versions + the pointer (no staging
    // leftovers), and _CURRENT resolves to an existing version
    val dir = new java.io.File(s"target/scratch/cache_race")
      .listFiles().find(_.getName.startsWith("sr_M")).get
    assert(!dir.listFiles().exists(_.getName.startsWith("_staging")))
    val cur = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_CURRENT").toPath)).trim
    assert(new java.io.File(dir, cur).isDirectory)
    // last-publish-wins: the published version is a complete parquet table
    assert(c.load("M", "2019", "2022", Seq("SEED")).count() >= 1)
  }

  test("keys with different ranges are independent tables") {
    val c = fresh("ranges")
    c.save("M", "2020", "2021", Seq(("2020-01-01", 1.0)).toDF("date", "A1"))
    assert(c.cachedCodes("M", "2020", "2022").isEmpty)
    assert(c.cachedCodes("D", "2020", "2021").isEmpty)
  }
}
