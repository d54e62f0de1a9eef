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

  // ---- BPE merge-step learning (tokenizer-training primitive) ----
  //
  // One greedy merge round of byte-pair-encoding style vocabulary
  // induction, applied at token granularity: count adjacent token pairs
  // corpus-wide, pick the most frequent, rewrite every document with the
  // pair fused into one unit. Iterated, this is exactly how BPE/wordpiece
  // vocabularies are trained — here the pair statistics and the rewrite
  // are both distributed, which is the part that matters at 100 TB (the
  // reference trainers are single-node).
  //
  // Contract: candidate pairs are restricted to A ≠ B. For A = B the
  // greedy left-to-right merge depends on run parity (in "a a a" only the
  // first pair merges) — a sequential fold public BPE implementations
  // disagree on and DuckDB's scalar-accumulator list_reduce cannot
  // replay; with A ≠ B matches can never be adjacent, so "merge every
  // match" IS the greedy result and both engines compute it with pure
  // row-local array ops. Merged units join with one space, so pair
  // identity stays unambiguous while only one merged unit exists per
  // round (guaranteed for the 2-round queries we declare; deeper stacks
  // would need a tuple key).

  /** Pair-start indexes of a token array: 1..n-1, empty below 2 tokens
    * (guarded — Spark's sequence(1, 0) would count DOWN). */
  private def pairIndexes(t: Column): Column =
    when(size(t) >= 2, sequence(lit(1), size(t) - 1))
      .otherwise(array().cast("array<int>"))

  /** THE pair identity: candidate pair starting at index `i`, encoded as
    * the space-joined string, or null when excluded (A = B, see
    * contract). Counting (bpeTopPair) and matching (bpeApplyMerge) must
    * share this one encoding — an independent copy that drifts would make
    * the rewrite silently no-op on the counted winner. */
  private def pairAt(t: Column, i: Column): Column =
    when(element_at(t, i) =!= element_at(t, i + 1),
      concat_ws(" ", element_at(t, i), element_at(t, i + 1)))

  /** Adjacent-pair candidates of one document's token array, as
    * space-joined strings; equal-neighbor pairs excluded (see contract). */
  private def pairCandidates(t: Column): Column =
    filter(transform(pairIndexes(t), i => pairAt(t, i)), x => x.isNotNull)

  /** Corpus-wide most frequent adjacent pair: ONE row (pair, cnt), count
    * descending with the pair string as tie-break. Two-phase aggregate +
    * TakeOrderedAndProject — no global sort, no collect. */
  def bpeTopPair(docs: DataFrame, toksCol: String): DataFrame =
    docs.select(explode(pairCandidates(col(toksCol))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1)

  /** Rewrite every document with the winning pair merged (greedy, valid
    * under the A ≠ B contract). `best` is the 1-row output of
    * [[bpeTopPair]], joined back as a broadcast — the t11-style 1-row
    * build side. The rewrite itself is row-local array arithmetic inside
    * codegen: match positions, then a transform that emits the fused unit
    * at each match and drops the consumed right neighbor. */
  def bpeApplyMerge(docs: DataFrame, toksCol: String,
      best: DataFrame): DataFrame = {
    val withPair = docs.crossJoin(broadcast(best.select(col("pair"))))
    val t = col(toksCol)
    val matches = filter(pairIndexes(t), i => pairAt(t, i) === col("pair"))
    // sequence(1, 0) would count DOWN in Spark — guard the empty doc.
    val fullIdx = when(size(t) >= 1, sequence(lit(1), size(t)))
      .otherwise(array().cast("array<int>"))
    val rebuilt = filter(
      transform(fullIdx, i =>
        when(exists(matches, m => m === i), col("pair"))
          .when(exists(matches, m => m === i - 1), lit(null))
          .otherwise(element_at(t, i))),
      x => x.isNotNull)
    withPair.withColumn(toksCol, rebuilt).drop("pair")
  }
}
