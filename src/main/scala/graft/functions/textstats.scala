package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus processing
  * (north-star extension: language ID, quality scoring, token counting,
  * fingerprinting over the `documents` table). All pure codegen'd built-in
  * compositions — no UDFs — so they stay inside whole-stage codegen and
  * scale linearly with the scan.
  */
object textstats {

  /** Whitespace tokens of the lowercased text, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** k-token shingles (strings joined by one space); empty array when the
    * document has fewer than k tokens. Backed by the codegen'd
    * [[ShingleArray]] kernel (one scan, no per-element lambda) —
    * value-identical to the sequence/slice/array_join formulation the
    * DuckDB oracles replay. */
  def shingles(tok: Column, k: Int): Column =
    expressions.shingleArray(tok, lit(k))

  /** Tiny deterministic stopword lists for the n-gram language heuristic.
    * Real deployments plug fastText-style models in via the same column
    * shape; the heuristic keeps the operator fully SQL-expressible. */
  val EnStop: Seq[String] = Seq("the", "of", "and", "to", "a", "in", "is", "it")
  val EsStop: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "es")

  private def hits(tok: Column, words: Seq[String]): Column =
    size(filter(tok, t => t.isin(words.map(lit): _*)))

  /** Language-ID heuristic: majority stopword hits, 'und' on ties. */
  def langId(tok: Column): Column = {
    val en = hits(tok, EnStop)
    val es = hits(tok, EsStop)
    when(en > es, "en").when(es > en, "es").otherwise("und")
  }

  /** Quality-score components: token count, mean token length, punctuation
    * ratio, stopword ratio — the standard cheap corpus-quality signals. */
  def tokenCount(c: Column): Column = size(tokens(c))

  def meanTokenLen(tok: Column): Column =
    round(aggregate(tok, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(tok), lit(1)), 4)

  def punctRatio(c: Column): Column =
    round(
      (length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast("double") /
        greatest(length(c), lit(1)), 4)

  def stopwordRatio(tok: Column): Column =
    round(hits(tok, EnStop).cast("double") / greatest(size(tok), lit(1)), 4)

  /** Composite quality band: docs need enough tokens, low punctuation and a
    * natural-language stopword presence to rate "good". Thresholds are
    * corpus-tuning knobs; held fixed here for determinism. */
  def qualityBand(c: Column): Column = {
    val tok = tokens(c)
    when(size(tok) < 20, "short")
      .when(punctRatio(c) > lit(0.10), "noisy")
      .when(stopwordRatio(tok) >= lit(0.02), "good")
      .otherwise("odd")
  }

  /** Fraction of tokens containing at least one ASCII letter (tokens are
    * already lowercased). Gopher's "80% of words must contain an alphabetic
    * character" rule reads this signal. */
  def alphaWordRatio(tok: Column): Column =
    round(size(filter(tok, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(tok), lit(1)), 4)

  /** Number of DISTINCT stopwords present — Gopher requires at least two
    * (presence of a few distinct function words is the cheapest
    * natural-language test there is). */
  def distinctStopHits(tok: Column, stop: Seq[String] = EnStop): Column =
    size(array_distinct(filter(tok, t => t.isin(stop.map(lit): _*))))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks each count as one token — a cheap stand-in for a real tokenizer
    * with the same column shape. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Repetition signal (Gopher-style): fraction of n-gram occurrences that
    * are duplicates of an earlier occurrence within the same document —
    * (total − distinct) / total over the ' '-joined n-gram multiset,
    * 0 for fully novel text, → 1 for loops, rounded to 4 so the oracle
    * replays it. Row-local (no explode, no shuffle); backed by the
    * codegen'd [[NgramDupFraction]] kernel — one hash-set walk instead of
    * the interpreted transform/slice/array_join/array_distinct HOF chain
    * it is value-identical to (and which the DuckDB oracle still runs). */
  def dupNgramFraction(tok: Column, n: Int): Column =
    expressions.ngramDupFraction(tok, lit(n))

  /** Repetition signal: share of n-gram occurrences claimed by the single
    * most frequent n-gram (boilerplate/loop detector), rounded to 4.
    * Backed by the codegen'd [[NgramTopFraction]] kernel (hash-map max
    * multiplicity in one pass) — value-identical to the sorted-run-length
    * fold formulation the oracle replays, without materializing or
    * sorting a shingle array per row. */
  def topNgramFraction(tok: Column, n: Int): Column =
    expressions.ngramTopFraction(tok, lit(n))

  /** Compression-ratio quality signal (Gopher/RefinedWeb-style): DEFLATE
    * size over raw byte size, rounded to 4 — natural prose lands around
    * 0.4–0.7, templated/looping text far lower, random bytes near (or
    * above) 1. Backed by the codegen'd [[DeflateLen]] expression; not
    * oracle-replayable (no SQL deflate in either engine), so consuming
    * queries are rows-only checked and the kernel is spec-tested. */
  def compressionRatio(c: Column): Column =
    round(expressions.deflateLen(c).cast("double") /
      greatest(octet_length(c), lit(1)), 4)

  /** Document fingerprint: minimum h64 over 8-token shingles of the
    * normalized text (winnowing-style). Equal fingerprints ⇒ the docs share
    * their minimal shingle — a cheap near-dup prefilter; exact dup when the
    * full rolling hash also matches. */
  def minShingleFingerprint(c: Column, k: Int = 8): Column = {
    val sh = shingles(tokens(c), k)
    when(size(sh) === 0, hashing.h64(lower(c)))
      .otherwise(array_min(transform(sh, s => hashing.h64(s))))
  }
}
