package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR importance-weight contracts: target-like raw documents outrank
  * target-unlike ones, and the DECIMAL-rounded log-ratio sums are
  * partition-order independent. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // Target docs ('t') speak vocabulary A; raw background docs speak B;
  // two raw docs speak A — DSIR must pull those to the top of the raw set.
  private def planted = (
    (1 to 6).map(i => (i.toLong, "t", "alpha beta gamma delta alpha beta")) ++
    (11 to 16).map(i => (i.toLong, "r", "omega psi chi phi omega psi")) ++
    Seq((21L, "r", "alpha beta gamma delta alpha beta"),
        (22L, "r", "beta gamma alpha delta beta gamma"))
  ).toDF("doc_id", "lang", "text")

  test("target-vocabulary raw docs outrank background raw docs") {
    val scored = TextSearch.dsirLogRatios(planted, "text",
        targetPred = col("lang") === "t", buckets = 256)
      .filter(col("lang") === "r")
      .select(col("doc_id"), col("dsir_logw").cast("double").as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val targetLike = Seq(21L, 22L).map(scored)
    val background = (11 to 16).map(i => scored(i.toLong))
    assert(targetLike.min > background.max,
      s"every A-vocab doc must beat every B-vocab doc: $scored")
  }

  test("log-weights are identical under different partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TextSearch.dsirLogRatios(df, "text",
          targetPred = col("lang") === "t", buckets = 256)
        .select(col("doc_id"), col("ntok"),
          col("dsir_logw").cast("string").as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    assert(run(planted.repartition(1)) == run(planted.repartition(7)))
  }

  test("ntok counts every token occurrence (explode, not distinct)") {
    val row = TextSearch.dsirLogRatios(planted, "text",
        targetPred = col("lang") === "t", buckets = 256)
      .filter(col("doc_id") === 1L).collect().head
    assert(row.getAs[Long]("ntok") == 6L)
  }

  test("bigram LM: a doc of frequent continuations scores higher than " +
      "one of rare continuations; sub-2-token docs drop out") {
    // corpus: 'a b' occurs 12x, 'a c' once; unigram floor keeps 'a c'
    // finite but far below
    val docs = (
      (1 to 6).map(i => (i.toLong, "a b a b")) ++
      Seq((10L, "a c"), (11L, "a b"), (20L, "solo"))
    ).toDF("doc_id", "text")
    val got = TextSearch.bigramLogProbs(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("nbg"),
          r.getAs[java.math.BigDecimal]("logp_sum").doubleValue()))
      .toMap
    assert(!got.contains(20L), "single-token doc has no bigrams")
    assert(got(1L)._1 == 3L) // 'a b','b a','a b'
    val perBg11 = got(11L)._2 / got(11L)._1 // pure 'a b'
    val perBg10 = got(10L)._2 / got(10L)._1 // pure 'a c'
    assert(perBg11 > perBg10,
      s"frequent continuation must outscore rare: $perBg11 vs $perBg10")
  }
}
