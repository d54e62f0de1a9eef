package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("upsertWide: incoming wins on shared columns, schema evolves both ways") {
    val existing = Seq(("2023-01", 1.0, "old1"), ("2023-02", 2.0, "old2"))
      .toDF("date", "pn01", "note")
    val incoming = Seq(("2023-02", 20.0, 200L), ("2023-03", 30.0, 300L))
      .toDF("date", "pn01", "pn02")
    val out = Relational.upsertWide(existing, incoming, "date")
      .orderBy("date").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("2023-01", "2023-02", "2023-03"))
    // shared column: incoming value wins where present
    assert(out.map(r => Option(r.get(1))).toSeq ===
      Seq(Some(1.0), Some(20.0), Some(30.0)))
    // old-only column survives; null for incoming-only rows
    assert(out.map(r => Option(r.get(2))).toSeq ===
      Seq(Some("old1"), Some("old2"), None))
    // new-only column appears; null for old-only rows
    assert(out.map(r => Option(r.get(3))).toSeq ===
      Seq(None, Some(200L), Some(300L)))
  }

  test("pendingAntiJoin returns only unprocessed keys") {
    val all = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("url", "v")
    val done = Seq("b").toDF("url")
    val pending = Relational.pendingAntiJoin(all, done, Seq("url"))
      .orderBy("url").as[(String, Int)].collect()
    assert(pending.toSeq === Seq(("a", 1), ("c", 3)))
  }

  test("validateCodes splits valid/invalid against the catalog") {
    val requested = Seq("PN01", "PN02", "FAKEA").toDF("code")
    val catalog = Seq("PN01", "PN02", "PN03").toDF("code")
    val (valid, invalid) = Relational.validateCodes(requested, catalog, "code")
    assert(valid.orderBy("code").as[String].collect().toSeq === Seq("PN01", "PN02"))
    assert(invalid.as[String].collect().toSeq === Seq("FAKEA"))
  }

  test("keepFirst is deterministic under the given order") {
    val df = Seq(("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b")).toDF("key", "ord", "v")
    val first = Relational.keepFirst(df, Seq("key"), Seq(col("ord")))
      .select("v").as[String].collect()
    assert(first.toSeq === Seq("a"))
  }

  test("batchIndex labels fixed-size groups per partition key") {
    val df = (1 to 5).map(i => ("g", i)).toDF("key", "ord")
    val labels = Relational.batchIndex(df, "key", Seq(col("ord")), size = 2, out = "b")
      .orderBy("ord").select("b").as[String].collect()
    assert(labels.toSeq === Seq("G_g_001", "G_g_001", "G_g_002", "G_g_002", "G_g_003"))
  }

  test("pivotSeries/unpivotSeries round-trip") {
    val long = Seq(("2023-01", "s1", 1.0), ("2023-01", "s2", 2.0), ("2023-02", "s1", 3.0))
      .toDF("date", "series", "value")
    val wide = Relational.pivotSeries(long, "date", "series", "value", Seq("s1", "s2"))
    assert(wide.columns.toSeq === Seq("date", "s1", "s2"))
    val back = Relational.unpivotSeries(wide, "date", "series", "value")
      .filter(col("value").isNotNull)
    assert(back.count() === 3)
  }

  test("unionDiagonal fills missing columns with nulls") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, "y")).toDF("id", "b")
    val u = Relational.unionDiagonal(Seq(a, b)).orderBy("id")
    assert(u.columns.toSeq === Seq("id", "a", "b"))
    assert(u.count() === 2)
    assert(u.filter(col("a").isNull).count() === 1)
  }

  test("saltedJoin == plain join on a pathologically hot key " +
      "(every row matched exactly once, no loss, no duplication)") {
    // 200 fact rows, ONE key value (maximal skew), 3-row build side with
    // a multi-match key to prove replication doesn't multiply matches
    val fact = (1 to 200).map(i => ("hot", i.toLong)).toDF("k", "rid")
    val build = Seq(("hot", "d1"), ("hot", "d2"), ("cold", "d3"))
      .toDF("k", "tag")
    val salted = Relational.saltedJoin(fact, build, Seq("k"),
        salt = xxhash64(col("rid")), buckets = 8)
      .collect().map(r => (r.getAs[Long]("rid"), r.getAs[String]("tag")))
      .toSeq.sorted
    val plain = fact.join(build, Seq("k"))
      .collect().map(r => (r.getAs[Long]("rid"), r.getAs[String]("tag")))
      .toSeq.sorted
    assert(salted == plain)
    assert(salted.size == 400) // 200 rows x 2 matching build rows
  }

  test("adaptiveSaltedJoin == plain join; hot keys spread over buckets " +
      "while cold keys stay on salt 0 (replication only where profiled)") {
    import org.apache.spark.sql.functions._
    // key 1 pathologically hot (180 of 200 rows); keys 2..6 cold
    val fact = (1 to 200)
      .map(i => (if (i <= 180) 1L else (i % 5) + 2L, i.toLong))
      .toDF("k", "rid")
    val build = (1L to 6L).map(k => (k, s"d$k")).toDF("k", "tag")
    val hot = Seq(1L).toDF("k")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("rid"), r.getAs[String]("tag"))).toSeq.sorted
    val plain = rows(fact.join(build, Seq("k")))
    val adaptive = rows(Relational.adaptiveSaltedJoin(fact, build,
      Seq("k"), salt = xxhash64(col("rid")), buckets = 8, hotKeys = hot))
    assert(adaptive == plain)
    assert(adaptive.size == 200)
    // degenerate profiles still agree with the plain join: nothing hot
    // (pure plain path) and everything hot (uniform saltedJoin shape)
    val noneHot = rows(Relational.adaptiveSaltedJoin(fact, build,
      Seq("k"), xxhash64(col("rid")), 8, hot.filter(lit(false))))
    assert(noneHot == plain)
    val allHot = rows(Relational.adaptiveSaltedJoin(fact, build,
      Seq("k"), xxhash64(col("rid")), 8, build.select(col("k"))))
    assert(allHot == plain)
    // the mechanism itself: hot fact rows actually spread over several
    // buckets, cold fact rows all sit on salt 0
    val salts = fact
      .join(broadcast(hot.withColumn("__hot", lit(true))), Seq("k"),
        "left_outer")
      .withColumn("__salt", when(col("__hot"),
        pmod(xxhash64(col("rid")), lit(8)).cast("int")).otherwise(lit(0)))
    assert(salts.filter(col("k") === 1L).select("__salt")
      .distinct().count() > 4, "hot key must fan out over buckets")
    assert(salts.filter(col("k") =!= 1L).select("__salt")
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }
}
