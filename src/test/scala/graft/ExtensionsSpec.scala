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
    "catalog is read-only, and a DV'd version fails loudly instead of " +
    "resurrecting deleted rows") {
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
    // a DV'd version refuses the SQL scan (silent resurrection is the
    // one unacceptable behavior)
    Manifest.commit(Seq((4L, "d")).toDF("id", "s"), tbl)           // v4
    Merge.deleteWhereDv(spark, tbl, col("id") === 1L)              // v5
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.t1").collect())
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // pre-DV versions still serve
    assert(sqlRead("SELECT * FROM graft.t1 VERSION AS OF 4") ==
      apiRead(4L))
    // read-only: DDL/DML refuse
    intercept[Exception](spark.sql("DROP TABLE graft.t1"))
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("t1"))
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
