package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the persisted BM25 inverted index ([[TextIndex]]):
  *  - correctness: probe scores/ranking ≡ the inline [[TextSearch.bm25TopK]]
  *    on the same corpus (IEEE-identical doubles, not just same rounding);
  *  - scale posture: the probe plan never reads the corpus file (its only
  *    inputs are the three persisted tables) and the postings scan is
  *    bucket-pruned to the probed terms' buckets;
  *  - contract edge: a term set matching fewer than k documents returns
  *    exactly the matching set (inline pads with zero-score docs).
  */
class TextIndexSpec extends SparkSpec {

  private val prefix = "graft_textidxspec"
  private val path = {
    val f = new java.io.File("/root/repo/target/scratch/textidxspec")
    f.mkdirs(); f.getPath
  }

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "lang", "text")

  private lazy val built: Unit =
    TextIndex.buildIndex(spark, docs, "doc_id", "text", path, prefix)

  private val terms = Seq("dup", "vector", "query")

  test("probe over the persisted index equals the inline BM25 top-k " +
    "(scores bit-for-bit, same rank order)") {
    built
    val inline = TextSearch.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .select("doc_id", "lang", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val probe = TextIndex.bm25Probe(spark, prefix, "doc_id", terms, k = 10)
      .select("doc_id", "lang", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(probe == inline,
      s"probe must replay inline exactly:\n$probe\nvs\n$inline")
  }

  test("probe plan is corpus-scan-free and bucket-prunes the postings " +
    "to the probed terms") {
    built
    val df = TextIndex.bm25Probe(spark, prefix, "doc_id", terms, k = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // The whole point of the index: no probe may read the corpus file.
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("textidxspec/postings"), p)
    assert(p.contains("textidxspec/termstats"), p)
    // token IN (...) on the bucketed column prunes to <= |terms| buckets
    // (of 8): the scan line advertises the selected-bucket count.
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r
    val counts = sel.findAllMatchIn(p).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, s"expected bucket pruning in:\n$p")
    assert(counts.forall(_ <= terms.size),
      s"postings scan must touch at most ${terms.size} buckets: $counts\n$p")
  }

  test("appendDocs folds new documents in: probe-after-append is " +
    "bit-identical to a fresh build over the union corpus") {
    // Split the corpus deterministically, build on one half, append the
    // other, and compare every probe artifact against a one-shot build.
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val incPath = new java.io.File(path, "inc").getPath
    val fullPath = new java.io.File(path, "full").getPath
    TextIndex.buildIndex(spark, half1, "doc_id", "text", incPath,
      "graft_tidx_inc")
    TextIndex.appendDocs(spark, half2, "doc_id", "text", incPath,
      "graft_tidx_inc")
    TextIndex.buildIndex(spark, docs, "doc_id", "text", fullPath,
      "graft_tidx_full")
    def probe(p: String) =
      TextIndex.bm25Probe(spark, p, "doc_id", terms, k = 10)
        .select("doc_id", "lang", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(probe("graft_tidx_inc") == probe("graft_tidx_full"),
      "incremental index must be probe-indistinguishable from a rebuild")
    // the folded statistics themselves agree, not just one probe's view
    def stats(p: String) = spark.table(TextIndex.corpusStatsTable(p))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(stats("graft_tidx_inc") == stats("graft_tidx_full"))
    def dfTab(p: String) = spark.table(TextIndex.termStatsTable(p))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfTab("graft_tidx_inc") == dfTab("graft_tidx_full"))
    // append preserves the bucket layout: the incremental probe still
    // bucket-prunes its postings scan
    val q = TextIndex.bm25Probe(spark, "graft_tidx_inc", "doc_id", terms, 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("SelectedBucketsCount: (\\d+) out of 8".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toList
      .exists(_ <= terms.size), plan)
  }

  test("compact collapses per-append file accumulation to one file per " +
    "bucket; probes are bit-identical before and after") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val cPath = new java.io.File(path, "cmp").getPath
    TextIndex.buildIndex(spark, half1, "doc_id", "text", cPath,
      "graft_tidx_cmp")
    TextIndex.appendDocs(spark, half2, "doc_id", "text", cPath,
      "graft_tidx_cmp")
    def files() = Option(new java.io.File(cPath, "postings").listFiles())
      .toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val before = files()
    assert(before > 8, s"append should have accumulated files, got $before")
    val probeBefore = TextIndex
      .bm25Probe(spark, "graft_tidx_cmp", "doc_id", terms, 10)
      .collect().map(_.toSeq).toSeq
    TextIndex.compact(spark, cPath, "graft_tidx_cmp")
    assert(files() == 8, s"expected one file per bucket, got ${files()}")
    val probeAfter = TextIndex
      .bm25Probe(spark, "graft_tidx_cmp", "doc_id", terms, 10)
      .collect().map(_.toSeq).toSeq
    assert(probeAfter == probeBefore)
    // pruning intact on the compacted layout
    val q = TextIndex.bm25Probe(spark, "graft_tidx_cmp", "doc_id", terms, 10)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("SelectedBucketsCount: (\\d+) out of 8".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toList
      .exists(_ <= terms.size), plan)
  }

  test("appendDocs of an empty batch is a no-op on every statistic") {
    built
    val before = spark.table(TextIndex.corpusStatsTable(prefix))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    TextIndex.appendDocs(spark, docs.filter(lit(false)), "doc_id", "text",
      path, prefix)
    val after = spark.table(TextIndex.corpusStatsTable(prefix))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == before, "an empty append must not poison n/dlsum")
  }

  test("a term set matching fewer than k docs returns exactly the " +
    "matching set") {
    built
    // 'dup' is the corpus's rare term; count its docs directly, then ask
    // for far more than that.
    val nDup = docs
      .filter(array_contains(graft.functions.textstats.tokens(col("text")),
        "dup")).count()
    assert(nDup > 0 && nDup < 500)
    val probe = TextIndex.bm25Probe(spark, prefix, "doc_id", Seq("dup"),
      k = nDup.toInt + 100)
    assert(probe.count() == nDup)
  }

  test("phraseProbe: positional adjacency, overlapping occurrences " +
    "counted individually, three-term phrases, absent-term docs excluded") {
    import spark.implicits._
    val pfx = "graft_textidxspec_phrase"
    val ppath = new java.io.File(
      "/root/repo/target/scratch/textidxspec_phrase")
    ppath.mkdirs()
    val fixture = Seq(
      (1L, "batch batch batch stream"), // "batch batch" overlaps: 2
      (2L, "the quick batch then batch batch again"), // 1
      (3L, "batch only once stream"), // adjacency broken: 0
      (4L, "stream batch stream batch stream"), // "stream batch stream": 2x? positions of phrase: idx0(stream batch stream) and idx2(stream batch stream) -> 2
      (5L, "no relevant tokens here")
    ).toDF("doc_id", "text")
    TextIndex.buildIndex(spark, fixture, "doc_id", "text",
      ppath.getPath, pfx)
    def probe(ts: String*) =
      TextIndex.phraseProbe(spark, pfx, "doc_id", ts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(probe("batch", "batch") == Map(1L -> 2L, 2L -> 1L))
    assert(probe("batch", "batch", "batch") == Map(1L -> 1L))
    assert(probe("stream", "batch", "stream") == Map(4L -> 2L))
    assert(probe("no", "batch") == Map.empty[Long, Long])
    intercept[IllegalArgumentException](probe("batch"))
  }

  test("phraseProbe plan is corpus-scan-free and bucket-prunes each " +
    "term's postings read") {
    built
    val df = TextIndex.phraseProbe(spark, prefix, "doc_id",
      Seq("table", "scan"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("textidxspec/postings"), p)
    // each side filters token = <term>: every postings scan prunes to
    // ONE bucket of 8
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r
    val counts = sel.findAllMatchIn(p).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, s"expected bucket pruning in:\n$p")
    assert(counts.forall(_ == 1),
      s"each per-term scan must touch exactly 1 bucket: $counts\n$p")
  }
}
