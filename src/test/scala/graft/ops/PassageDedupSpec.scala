package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** d9: passage-level exact dedup — first corpus-wide occurrence wins. */
class PassageDedupSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (1L, "a b c d e f g h i j k l"),
    (2L, "a b c d x y z w"),
    (3L, "e f g h"),
    (4L, "")).toDF("doc_id", "text")

  test("first (id, pos) occurrence of each passage is kept") {
    val pd = Dedup.passageDedup(fixture, "doc_id", "text", k = 4)
    val kept = pd.filter(col("kept"))
      .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    val dropped = pd.filter(!col("kept"))
      .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    assert(kept == Set((1L, 0), (1L, 1), (1L, 2), (2L, 1)))
    assert(dropped == Set((2L, 0), (3L, 0)))
  }

  test("empty documents produce no passages; short tails still cut") {
    val pd = Dedup.passageDedup(fixture, "doc_id", "text", k = 5)
    assert(pd.filter(col("doc_id") === 4L).count() == 0)
    // doc 1 has 12 tokens -> k=5 cuts 3 passages (5, 5, 2)
    val doc1 = pd.filter(col("doc_id") === 1L)
      .orderBy("pos").select("passage").as[String].collect()
    assert(doc1.toSeq == Seq("a b c d e", "f g h i j", "k l"))
  }

  test("non-text columns pass through for reassembly") {
    val withLang = fixture.withColumn("lang", lit("en"))
    val pd = Dedup.passageDedup(withLang, "doc_id", "text", k = 4)
    assert(pd.columns.toSet ==
      Set("doc_id", "lang", "pos", "passage", "kept"))
  }

  test("intraDocDedup keeps first occurrences in order, leaves tails, " +
    "and is idempotent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c d a b"), // passages: "a b","a b","c d","a b"
      (2L, "x y x"),           // short tail "x" survives
      (3L, ""),                // empty doc
      (4L, "p q r s")          // no repeats
    ).toDF("doc_id", "text")
    val r = Dedup.intraDocDedup(docs, "text", k = 2)
      .select("doc_id", "passages", "kept_passages", "rewritten")
      .as[(Long, Int, Int, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 4, 2, "a b c d")))
    assert(r(2L) == ((2L, 2, 2, "x y x")))
    assert(r(3L) == ((3L, 0, 0, "")))
    assert(r(4L) == ((4L, 2, 2, "p q r s")))
    // idempotence: rerunning on the rewritten text changes nothing
    val once = Dedup.intraDocDedup(docs, "text", 2)
      .select(col("doc_id"), col("rewritten").as("text"))
    val twice = Dedup.intraDocDedup(once, "text", 2)
      .select("doc_id", "rewritten").as[(Long, String)].collect().toMap
    assert(twice == r.map { case (k, v) => k -> v._4 })
  }

  test("boilerplateScrub removes >=minDocs passages from ALL docs, " +
    "keeps sub-threshold duplicates everywhere") {
    // "a b" in 3 docs (boilerplate at minDocs=3), "c d" in 2 (kept), the
    // rest unique. Unlike passageDedup, no first copy of "a b" survives.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d"),
      (3L, "a b x y"),
      (4L, "")).toDF("doc_id", "text")
    val sc = Dedup.boilerplateScrub(docs, "doc_id", "text", k = 2,
      minDocs = 3)
    val dropped = sc.filter(!col("kept"))
      .select("doc_id", "passage").as[(Long, String)].collect().toSet
    assert(dropped == Set((1L, "a b"), (2L, "a b"), (3L, "a b")),
      "boilerplate dies in every document, including the first")
    val rebuilt = Dedup.reassembleKept(sc, Seq("doc_id"), "text2")
      .as[(Long, String)].collect().toMap
    assert(rebuilt(1L) == "c d e f")
    assert(rebuilt(2L) == "c d", "2-doc duplicate survives under threshold")
    assert(rebuilt(3L) == "x y")
    assert(!rebuilt.contains(4L))
  }

  test("spanDedup removes a planted 50-token duplicate block as ONE " +
    "maximal token-exact span, not a grid of passages") {
    val block = (0 until 50).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, block),                                  // first occurrence: kept
      (2L, s"u0 u1 u2 $block v0 v1 v2"),            // block at tokens 3..52
      (3L, (0 until 9).map(i => s"b$i").mkString(" ") + " q0 q1")
    ).toDF("doc_id", "text")
    val sd = Dedup.spanDedup(docs, "doc_id", "text", k = 10)
    val r = sd.select("doc_id", "n_tokens", "n_spans", "dup_tokens",
        "rewritten")
      .as[(Long, Int, Int, Int, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 50, 0, 0, block)), "first occurrence untouched")
    assert(r(2L)._3 == 1, "the 41 duplicated stride-1 shingles coalesce " +
      "into a single maximal span")
    assert(r(2L)._4 == 50, "the span is exactly the 50 planted tokens — " +
      "no grid rounding")
    assert(r(2L)._5 == "u0 u1 u2 v0 v1 v2",
      "rewrite removes the block, keeps the straddling context")
    val spans2 = sd.filter(col("doc_id") === 2L)
      .select("spans").as[Seq[Seq[Int]]].collect().head
    assert(spans2 == Seq(Seq(3, 52)), "token-exact inclusive bounds")
    assert(r(3L) == ((3L, 11, 0, 0,
      (0 until 9).map(i => s"b$i").mkString(" ") + " q0 q1")),
      "a shared run shorter than k is below the match threshold")
  }

  test("spanDedup keeps a 1-token gap between two in-document copies as " +
    "two spans and survives empty docs") {
    val block = (0 until 50).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, block),
      (2L, s"x0 x1 $block y0 $block z0"), // copies at 2..51 and 53..102
      (3L, "")).toDF("doc_id", "text")
    val sd = Dedup.spanDedup(docs, "doc_id", "text", k = 10)
    val d2 = sd.filter(col("doc_id") === 2L)
      .select("n_spans", "dup_tokens", "rewritten", "spans")
      .as[(Int, Int, String, Seq[Seq[Int]])].collect().head
    assert(d2._1 == 2 && d2._2 == 100)
    assert(d2._4 == Seq(Seq(2, 51), Seq(53, 102)),
      "the unique gap token keeps the spans apart")
    assert(d2._3 == "x0 x1 y0 z0")
    val d3 = sd.filter(col("doc_id") === 3L)
      .select("n_tokens", "n_spans", "rewritten")
      .as[(Int, Int, String)].collect().head
    assert(d3 == ((0, 0, "")))
  }

  test("spanDedup catches a duplicate d9's fixed grid misses: a block " +
    "straddling passage boundaries") {
    // 12-token block planted at offset 3 in doc 2: with k=6 the fixed
    // grid cuts doc 2 at tokens 0/6/12 — NO grid passage equals a doc-1
    // passage, so passageDedup sees nothing; spanDedup marks the block.
    val block = (0 until 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, block),
      (2L, s"c0 c1 c2 $block d0 d1 d2")).toDF("doc_id", "text")
    val pd = Dedup.passageDedup(docs, "doc_id", "text", k = 6)
    assert(pd.filter(!col("kept")).count() == 0,
      "the grid-aligned operator is blind to the straddling duplicate")
    val sd = Dedup.spanDedup(docs, "doc_id", "text", k = 6)
    val d2 = sd.filter(col("doc_id") === 2L)
      .select("n_spans", "dup_tokens", "rewritten")
      .as[(Int, Int, String)].collect().head
    assert(d2 == ((1, 12, "c0 c1 c2 d0 d1 d2")))
  }

  test("reassembleKept rebuilds docs in position order; redundant docs vanish") {
    val pd = Dedup.passageDedup(fixture, "doc_id", "text", k = 4)
    val rebuilt = Dedup.reassembleKept(pd, Seq("doc_id"), "text2")
      .as[(Long, String)].collect().toMap
    assert(rebuilt(1L) == "a b c d e f g h i j k l")
    assert(rebuilt(2L) == "x y z w", "duplicate head passage dropped")
    assert(!rebuilt.contains(3L), "fully-redundant doc disappears")
    assert(!rebuilt.contains(4L), "empty doc disappears")
  }
}
