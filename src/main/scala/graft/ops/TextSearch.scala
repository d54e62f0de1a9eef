package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.textstats

/** Keyword search scoring (BM25) over a document corpus — the text-side
  * retrieval twin of the embedding ANN family in [[Similarity]] (north-star
  * extension: corpus triage / quality queries like "rank documents for
  * these probe terms" over billions of rows).
  *
  * Design: the query term set is a small FIXED list, so per-term frequency
  * is a row-local `size(filter(tokens, _ == term))` — no token explode, no
  * (doc × term) shuffle. Corpus statistics (N, Σdl, per-term document
  * frequency) are ONE aggregate row broadcast back over the scan; scoring
  * is then a pure codegen'd map and top-k is TakeOrderedAndProject (no
  * global sort). Two scans of the corpus total, both column-pruned.
  *
  * Determinism: scores are IEEE double arithmetic in a fixed left-to-right
  * term order, with every constant shared between the Column tree and the
  * [[sqlScore]] DuckDB twin via the same Scala values — both engines parse
  * identical literals, so scores match bit-for-bit (rounded to 4 at the
  * output for rank stability, ids as tie-break).
  */
object TextSearch {

  /** Lucene-standard BM25 parameters. */
  val K1 = 1.2
  val B = 0.75

  /** Adds `dl`, per-term `tf<i>`, and a `score` column; other input columns
    * pass through. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val tok = textstats.tokens(col(textCol))
    val keep = docs.columns.filterNot(_ == textCol).map(col)
    val base = docs.select(keep ++ Seq(size(tok).as("dl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(tok, x => x === lit(t))).as(s"tf$i")
      }: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("dlsum") +:
        terms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("int")).as(s"df$i")): _*)
    val avgdl = col("dlsum") / col("n")
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * ((col(s"tf$i") * lit(K1 + 1)) /
        (col(s"tf$i") + lit(K1) * (lit(1 - B) + lit(B) * (col("dl") / avgdl))))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .drop("n" +: "dlsum" +: terms.indices.map(i => s"df$i"): _*)
  }

  /** Top-k by rounded score (ids break ties) — TakeOrderedAndProject, not a
    * global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame =
    bm25(docs, idCol, textCol, terms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** DuckDB twin of the score expression, over columns `dl`/`tf<i>` and
    * scalar stats `n`/`dlsum`/`df<i>` — constants interpolated from the
    * SAME Scala values as the Column tree above. */
  def sqlScore(terms: Seq[String]): String =
    terms.indices.map { i =>
      s"""ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) *
         ((tf$i * ${K1 + 1}) / (tf$i + $K1 * (${1 - B} + $B * (dl / (dlsum / n)))))"""
    }.mkString(" + ")

  /** Unigram-LM quality signal (CCNet-style, simplified): per-document
    * token count and summed log-probability under the corpus's own unigram
    * distribution — low (very negative) average log-prob flags documents
    * whose token mix is unlike the corpus. Returns one row per document
    * with `ntok` and `logp_sum`; divide at the edge for cross-entropy.
    *
    * Determinism: each token's log-prob is rounded to 6 decimals and summed
    * as DECIMAL(18,6) — exact integer arithmetic, so the per-doc sum is
    * identical under any partitioning and on any engine.
    *
    * Scale: one explode + two keyed aggregations. The unigram table is
    * broadcast (a 10M-type vocabulary is ~100s of MB — broadcastable;
    * beyond that drop the hint and let the join shuffle). */
  def unigramLogProbs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val keep = docs.columns.filterNot(_ == textCol).map(col)
    val toks = docs.select(keep :+
      explode(textstats.tokens(col(textCol))).as("__t"): _*)
    val vocab = toks.groupBy(col("__t")).agg(count(lit(1)).as("__cnt"))
    val total = vocab.agg(sum(col("__cnt")).as("__total"))
    val logp = vocab.crossJoin(broadcast(total))
      .select(col("__t"),
        round(log(col("__cnt") / col("__total")), 6)
          .cast("decimal(18,6)").as("__logp"))
    toks.join(broadcast(logp), "__t")
      .groupBy(keep.toSeq: _*)
      .agg(count(lit(1)).as("ntok"), sum(col("__logp")).as("logp_sum"))
  }
}
