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
