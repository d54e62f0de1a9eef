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
