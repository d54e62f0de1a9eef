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

  test("text-kernel SQL functions evaluate like their Column twins") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT shingle_array(array('a', 'b', 'c'), 2), " +
        "ngram_dup_fraction(array('a', 'b', 'a', 'b', 'a'), 2), " +
        "ngram_top_fraction(array('a', 'b', 'a', 'b', 'a'), 2)")
      .collect().head
    assert(row.getSeq[String](0) == Seq("a b", "b c"))
    // 2-grams: [a b, b a, a b, b a] -> 2 of 4 are repeats; top gram holds 2/4
    assert(row.getDouble(1) == 0.5)
    assert(row.getDouble(2) == 0.5)
  }

  test("graft catalog: SQL VERSION AS OF reads equal Manifest.read at " +
    "the same version — head, history, and a restored table — the " +
    "catalog is read-only, and a DV'd version serves the DV-APPLIED " +
    "read through the analysis rewrite (plans pinned: DV-less = " +
    "join-free native scan, DV'd = anti-join with pushdown intact)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.ops.{Manifest, Merge}
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val tbl = s"$root/t1"
    Manifest.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl) // v1
    Manifest.commit(Seq((3L, "c")).toDF("id", "s"), tbl)           // v2
    def sqlRead(q: String) = spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def apiRead(v: Long) = Manifest.read(spark, tbl, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sqlRead("SELECT * FROM graft.t1") == apiRead(2L))
    assert(sqlRead("SELECT * FROM graft.t1 VERSION AS OF 1") ==
      apiRead(1L))
    // the catalog resolution pins files; predicates still push down
    // into the native parquet scan (it IS Spark's v2 parquet table)
    val plan = spark.sql(
      "SELECT * FROM graft.t1 WHERE id = 3").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,3)]"),
      plan)
    // restore: VERSION AS OF keeps working on and across the rollback
    Manifest.restore(tbl, 1L)                                      // v3
    assert(sqlRead("SELECT * FROM graft.t1") == apiRead(1L))
    assert(sqlRead("SELECT * FROM graft.t1 VERSION AS OF 2") ==
      apiRead(2L))
    // absolute-path identifier (the delta.`/path` convention)
    assert(sqlRead(s"SELECT * FROM graft.`$tbl` VERSION AS OF 2") ==
      apiRead(2L))
    // a DV-less read stays the join-free native v2 scan (the rewrite
    // must cost nothing when no DV is in force)
    assert(!spark.sql("SELECT * FROM graft.t1").queryExecution
      .executedPlan.toString.contains("Join"))
    // a DV'd version serves the DV-APPLIED read: the analysis rewrite
    // replaces the marked relation with Manifest.read's plan
    Manifest.commit(Seq((4L, "d")).toDF("id", "s"), tbl)           // v4
    Merge.deleteWhereDv(spark, tbl, col("id") === 1L)              // v5
    assert(sqlRead("SELECT * FROM graft.t1") ==
      Set((2L, "b"), (4L, "d")), "SQL must hide the DV'd position")
    assert(sqlRead("SELECT * FROM graft.t1") == apiRead(5L))
    // the DV'd plan carries the position anti-join, and predicates
    // still push into the inner parquet scan
    val dvPlan = spark.sql("SELECT * FROM graft.t1 WHERE id = 4")
      .queryExecution.executedPlan.toString
    assert(dvPlan.contains("Join") && dvPlan.contains("LeftAnti"), dvPlan)
    assert(dvPlan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,4)]"),
      dvPlan)
    // pre-DV versions still serve join-free
    assert(sqlRead("SELECT * FROM graft.t1 VERSION AS OF 4") ==
      apiRead(4L))
    // the rewrite reaches DV'd tables inside SUBQUERIES too (an
    // escaped path would fail loudly at the marker's scan refusal —
    // never resurrect — but it must not escape)
    assert(spark.sql("SELECT count(*) AS n FROM range(10) WHERE id IN " +
      "(SELECT id FROM graft.t1)").collect().head.getLong(0) == 2L)
    // read-only: DDL/DML refuse
    intercept[Exception](spark.sql("DROP TABLE graft.t1"))
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("t1"))
  }

  test("graft catalog: SELECT * FROM graft.<t>.history equals " +
    "Manifest.history — merge-on-read deletes read as optype=delete " +
    "with their DV row deltas — and a real table named 'history' " +
    "would win over the metadata table") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.ops.{Manifest, Merge}
    import spark.implicits._
    // the catalog instance is CACHED per session once resolved, so a
    // later conf change can't re-root it: reuse the active root (or
    // register it if this test runs first)
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    val root = scala.util.Try(
      spark.conf.get("spark.sql.catalog.graft.root")).getOrElse {
      val r = Files.createTempDirectory("graft_cat_h").toString
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }
    val tbl = s"$root/t2"
    Manifest.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl) // v1
    Manifest.commit(Seq((3L, "c")).toDF("id", "s"), tbl)           // v2
    Merge.deleteWhereDv(spark, tbl, col("id") === 2L)              // v3
    val api = Manifest.history(spark, tbl).map(c => (c.version,
      c.change_type, c.files_added, c.files_removed, c.rows_added,
      c.rows_removed, c.data_change, c.commit_ts))
    val viaSql = spark.sql(
      "SELECT * FROM graft.t2.history ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
        r.getTimestamp(7).getTime))
      .toSeq
    assert(viaSql == api, s"sql=$viaSql api=$api")
    assert(api.map(_._8).sorted == api.map(_._8),
      "commit timestamps are monotone along the version chain here")
    assert(viaSql.exists(r => r._2 == "delete" && r._6 == 1L),
      "the erasure must read as a delete with its DV row delta")
    // a REAL manifest table named history shadows the metadata table
    val shadow = s"$root/t3/history"
    Manifest.commit(Seq((9L, "z")).toDF("id", "s"), shadow)
    assert(spark.sql("SELECT * FROM graft.t3.history").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("graft catalog: SELECT * FROM graft.<t>.files is the live-file " +
    "inventory (adding version, recorded rows, DV'd positions) and " +
    "reconciles with the metadata rowCount") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.ops.{Manifest, Merge}
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    val root = scala.util.Try(
      spark.conf.get("spark.sql.catalog.graft.root")).getOrElse {
      val r = Files.createTempDirectory("graft_cat_f").toString
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }
    val tbl = s"$root/t5"
    Manifest.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1), tbl)                                           // v1
    Manifest.commit(Seq((3L, "c")).toDF("id", "s").coalesce(1), tbl) // v2
    Merge.deleteWhereDv(spark, tbl, col("id") === 1L)              // v3
    val viaSql = spark.sql(
      "SELECT * FROM graft.t5.files ORDER BY file").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .toSeq
    assert(viaSql == Manifest.fileInventory(tbl).sortBy(_._1))
    assert(viaSql.map(_._2).toSet == Set(1L, 2L),
      "adding versions: one file from each append")
    assert(viaSql.map(_._4).sum == 1L, "one DV'd position")
    val logical = viaSql.flatMap(_._3).sum - viaSql.map(_._4).sum
    assert(Manifest.rowCount(tbl).contains(logical) &&
      Manifest.read(spark, tbl).count() == logical)
  }

  test("graft catalog: TIMESTAMP AS OF serves the newest version " +
    "committed at or before the timestamp, and a pre-table timestamp " +
    "fails loudly") {
    import java.nio.file.Files
    import graft.ops.Manifest
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    val root = scala.util.Try(
      spark.conf.get("spark.sql.catalog.graft.root")).getOrElse {
      val r = Files.createTempDirectory("graft_cat_t").toString
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }
    val tbl = s"$root/t4"
    val t0 = System.currentTimeMillis() - 1
    Manifest.commit(Seq((1L, "a")).toDF("id", "s"), tbl)        // v1
    val t1 = System.currentTimeMillis()
    Thread.sleep(25)
    Manifest.commit(Seq((2L, "b")).toDF("id", "s"), tbl)        // v2
    def ids(q: String) = spark.sql(q).collect().map(_.getLong(0)).toSet
    assert(ids(s"SELECT id FROM graft.t4 TIMESTAMP AS OF " +
      s"timestamp_millis(${t1}L)") == Set(1L))
    assert(ids("SELECT id FROM graft.t4 TIMESTAMP AS OF " +
      "current_timestamp()") == Set(1L, 2L))
    val e = intercept[Exception](ids(s"SELECT id FROM graft.t4 " +
      s"TIMESTAMP AS OF timestamp_millis(${t0}L)"))
    assert(e.getMessage.contains("no version"), e.getMessage)
  }

  test("graft catalog: VERSION AS OF '<tag>' resolves named refs to " +
    "their pinned version (≡ the numeric read), graft.<t>.tags lists " +
    "them, and an absent tag fails loudly") {
    import java.nio.file.Files
    import graft.ops.Manifest
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    val root = scala.util.Try(
      spark.conf.get("spark.sql.catalog.graft.root")).getOrElse {
      val r = Files.createTempDirectory("graft_cat_tags").toString
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }
    val tbl = s"$root/t_tags"
    Manifest.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), tbl) // v1
    Manifest.commit(Seq((3L, "c")).toDF("id", "s"), tbl)           // v2
    Manifest.tag(tbl, "audit-1", 1L)
    val byTag = spark.sql(
      "SELECT id FROM graft.t_tags VERSION AS OF 'audit-1' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(byTag == Seq(1L, 2L))
    assert(byTag == spark.sql(
      "SELECT id FROM graft.t_tags VERSION AS OF 1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq)
    assert(spark.sql("SELECT * FROM graft.t_tags.tags").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("audit-1", 1L)))
    val e = intercept[Exception](spark.sql(
      "SELECT id FROM graft.t_tags VERSION AS OF 'nope'").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no tag")), msgs(e))
  }

  test("SQL DML over governed tables: DELETE/UPDATE ≡ the Scala API " +
    "(same survivors, deletion-vector commit shape earned — zero file " +
    "rewrites, MoR history), num_affected_rows returned, subqueries " +
    "and the remaining verbs still refuse loudly") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.ops.{Manifest, Merge}
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // absolute-path identifiers (the delta.`/path` convention): the
    // session's cached catalog instance may carry another test's root
    def seed(name: String): String = {
      val p = s"$root/$name"
      Manifest.commit((0L until 20L).map(i => (i, i * 10))
        .toDF("id", "v").coalesce(2), p, statsCols = Seq("id"))
      p
    }
    def pairs(p: String) = Manifest.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // DELETE: SQL vs API twins on identical tables
    val sqlT = seed("sql_t"); val apiT = seed("api_t")
    val del = spark.sql(
      s"DELETE FROM graft.`$sqlT` WHERE id % 7 = 3 OR id = 19")
    assert(del.columns.toSeq == Seq("num_affected_rows") &&
      del.collect().head.getLong(0) == 4L) // ids 3, 10, 17, 19
    Merge.deleteWhereDv(spark, apiT,
      col("id") % 7 === 3L || col("id") === 19L)
    assert(pairs(sqlT) == pairs(apiT), "SQL DELETE ≡ API DELETE")
    // the commit shape is merge-on-read: no data file moved, DV lines
    // published, history reads as a delete
    assert(Manifest.files(sqlT) == Manifest.files(sqlT, 1L),
      "zero rewrites — the DELETE must publish only deletion vectors")
    assert(Manifest.deletionVectors(sqlT).nonEmpty)
    assert(Manifest.history(spark, sqlT).last.change_type == "delete")
    assert(Manifest.history(spark, sqlT).last.rows_removed == 4L)
    // UPDATE: SQL vs API, with an int literal cast onto the bigint
    // column (the alignment a raw parsed assignment lacks)
    spark.sql(s"UPDATE graft.`$sqlT` SET v = v + 5, id = 1000 WHERE id = 4")
    Merge.updateWhereDv(spark, apiT, col("id") === 4L,
      sets = Seq("v" -> (col("v") + 5L), "id" -> lit(1000L)))
    assert(pairs(sqlT) == pairs(apiT), "SQL UPDATE ≡ API UPDATE")
    assert(pairs(sqlT).contains((1000L, 45L)))
    // SQL reads over the DML'd table serve the DV-applied view
    assert(spark.sql(s"SELECT count(*) FROM graft.`$sqlT`")
      .collect().head.getLong(0) == 16L)
    // subqueries refuse loudly, naming the Scala API
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](spark.sql(
      s"DELETE FROM graft.`$sqlT` WHERE id IN (SELECT id FROM graft.`$apiT`)"))
    assert(msgs(e).exists(_.contains("deleteKeysDv")), msgs(e))
    // the read-only rule retires ONLY for DELETE/UPDATE
    val e2 = intercept[Exception](spark.sql(
      s"DROP TABLE graft.`$sqlT`"))
    assert(msgs(e2).exists(_.contains("read-only")), msgs(e2))
    val e3 = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$sqlT` VALUES (1, 2)"))
    assert(e3 != null)
    // DML on a table under CHECK constraints still validates: the
    // update images go through the same gated commit
    Manifest.addConstraint(spark, sqlT, "v_nonneg", "v >= 0")
    val e4 = intercept[Exception](spark.sql(
      s"UPDATE graft.`$sqlT` SET v = -1 WHERE id = 5"))
    assert(msgs(e4).exists(_.contains("v_nonneg")), msgs(e4))
    assert(pairs(sqlT).contains((5L, 50L)), "failed UPDATE changed nothing")
    // DESCRIBE DETAIL convention: graft.<t>.detail is one metadata-only
    // row of table facts, consistent with the API answers
    val detail = spark.sql(s"SELECT * FROM graft.`$sqlT`.detail")
      .collect().head
    assert(detail.getLong(0) == Manifest.version(sqlT))
    assert(detail.getLong(1) == Manifest.files(sqlT).size.toLong)
    assert(detail.getLong(2) ==
      Manifest.read(spark, sqlT).count(), "metadata rows ≡ real count")
    assert(detail.getLong(3) ==
      Manifest.deletionVectors(sqlT).values.map(_._2).sum)
    assert(detail.getLong(5) == 1L, "the v_nonneg constraint counts")
    // MERGE INTO (upsert-by-key): SQL ≡ the Merge.upsert API — updates
    // replace matched keys, unmatched keys insert
    (0L until 6L).map(i => (i * 2, i * 2 * 10 + 7))
      .toDF("id", "v").createOrReplaceTempView("s38_src")
    val mrg = spark.sql(
      s"MERGE INTO graft.`$sqlT` AS t USING s38_src AS s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    assert(mrg.collect().head.getLong(0) == 6L)
    Merge.upsert(spark, apiT,
      (0L until 6L).map(i => (i * 2, i * 2 * 10 + 7)).toDF("id", "v"),
      Seq("id"))
    assert(pairs(sqlT) == pairs(apiT), "SQL MERGE ≡ API upsert")
    assert(pairs(sqlT).contains((0L, 7L)) && pairs(sqlT).contains((8L, 87L)))
    // unsupported merge shapes refuse loudly naming the Scala API
    val e5 = intercept[Exception](spark.sql(
      s"MERGE INTO graft.`$sqlT` AS t USING s38_src AS s ON t.id = s.id " +
        "WHEN MATCHED THEN DELETE"))
    assert(msgs(e5).exists(_.contains("Merge.upsert")), msgs(e5))
  }

  test("round-6 kernel SQL functions: minhash signature and BPE pair ops") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT size(minhash_sig_array(array('a b c', 'b c d'))), " +
        "minhash_sig_array(cast(array() AS array<string>)), " +
        "bpe_pair_array(array('a', 'b', 'c')), " +
        "bpe_rewrite(array('a', 'b', 'c'), array(struct('a', 'b')))")
      .collect().head
    assert(row.getInt(0) == graft.functions.hashing.NumHashes)
    assert(row.isNullAt(1), "empty shingles -> null signature")
    assert(row.getSeq[org.apache.spark.sql.Row](2).map(r =>
      (r.getString(0), r.getString(1))) == Seq(("a", "b"), ("b", "c")))
    assert(row.getSeq[String](3) == Seq("a b", "c"))
  }
}
