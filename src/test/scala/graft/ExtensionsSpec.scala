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
