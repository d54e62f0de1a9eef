package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** t11 BM25 scoring properties + t12 sequence-packing invariants. */
class TextSearchPackSpec extends SparkSpec {

  import spark.implicits._

  test("bm25: rare-term docs outrank common-term docs; no-term docs score 0") {
    val docs = Seq(
      (1L, "rare word here"),
      (2L, "common common common words"),
      (3L, "common words again and again"),
      (4L, "nothing matching at all"),
      (5L, "rare rare word")).toDF("doc_id", "text")
    val scored = TextSearch.bm25(docs, "doc_id", "text",
      Seq("rare", "common")).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scored(4L) == 0.0, "no query term -> zero score")
    // 'rare' appears in 2/5 docs, 'common' in 2/5 but with higher tf; the
    // doc with tf=2 of the rare term must beat single-occurrence docs.
    assert(scored(5L) > scored(1L), "higher tf raises the score")
    assert(scored.values.forall(_ >= 0.0))
  }

  test("bm25TopK returns k rows ordered by rounded score then id") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, if (i % 4 == 0) "hit token" else "miss token"))
      .toDF("doc_id", "text")
    val top = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("hit"), k = 3)
      .select("doc_id").as[Long].collect()
    assert(top.toSeq == Seq(0L, 4L, 8L), "equal scores fall back to id order")
  }

  test("packSequences: contiguous coverage, exact seq count, span arithmetic") {
    val docs = Seq.tabulate(12)(i => (i.toLong, "s", 7 + i)).toDF(
      "doc_id", "src", "ntok")
    val packed = Sampling.packSequences(docs, "src", "doc_id", "ntok",
      budget = 10L).collect()
    val total = docs.agg(sum("ntok")).as[Long].head()
    val maxSeq = packed.map(_.getAs[Long]("seq_last")).max
    assert(maxSeq + 1 == (total + 9) / 10, "seqs = ceil(total/budget)")
    packed.foreach { r =>
      val (first, last, spans) = (r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last"), r.getAs[Long]("spans"))
      assert(first <= last && spans == last - first + 1)
      assert(spans <= r.getAs[Int]("ntok") / 10 + 2,
        "a doc spans at most tokens/budget + 2 sequences")
    }
  }

  test("unigramLogProbs: rarer token mixes score lower; sums are exact") {
    val docs = Seq(
      (1L, "the the the the"), // all high-frequency
      (2L, "the odd one"), // mixes in rare tokens
      (3L, "")).toDF("doc_id", "text")
    val got = TextSearch.unigramLogProbs(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ntok"), r.getAs[java.math.BigDecimal]("logp_sum")))
      .toMap
    assert(got(1L)._1 == 4 && got(2L)._1 == 3)
    // doc 1: 4 * round(ln(5/7), 6); 'the' appears 5 of 7 corpus tokens
    val lnThe = BigDecimal(math.log(5.0 / 7)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(got(1L)._2) == lnThe * 4, s"got ${got(1L)._2}")
    assert(BigDecimal(got(2L)._2) < BigDecimal(got(1L)._2),
      "rare-token doc must have lower total log-prob")
    assert(!got.contains(3L), "token-free docs drop out")
  }

  test("stratifiedSample: per-group rates, nested-subset property") {
    val docs = Seq.tabulate(2000)(i =>
      (i.toLong, if (i % 2 == 0) "big" else "small")).toDF("doc_id", "grp")
    def ids(rates: Map[String, Double]) =
      Sampling.stratifiedSample(docs, "grp", "doc_id", rates, 0.0)
        .select("doc_id").as[Long].collect().toSet
    val half = ids(Map("big" -> 0.5, "small" -> 0.1))
    val quarter = ids(Map("big" -> 0.25, "small" -> 0.05))
    assert(quarter.subsetOf(half), "lower rates must nest inside higher")
    val bigRate = half.count(_ % 2 == 0) / 1000.0
    val smallRate = half.count(_ % 2 == 1) / 1000.0
    assert(math.abs(bigRate - 0.5) < 0.06, s"big rate $bigRate")
    assert(math.abs(smallRate - 0.1) < 0.04, s"small rate $smallRate")
    assert(ids(Map.empty).isEmpty, "default rate 0 keeps nothing")
  }

  test("packSequences is independent of input partitioning") {
    val docs = Seq.tabulate(30)(i => (i.toLong, s"g${i % 2}", 5 + i % 9))
      .toDF("doc_id", "src", "ntok")
    def layout(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "src", "doc_id", "ntok", budget = 16L)
        .select("doc_id", "seq_first", "seq_last")
        .collect().map(_.toSeq).toSet
    assert(layout(docs.repartition(1)) == layout(docs.repartition(7)))
  }

  test("bpe merge step: true argmax pair wins, rewrite fuses greedily and " +
    "shrinks the corpus by exactly the merge count") {
    val docs = Seq(
      (1L, Seq("x", "y", "x", "y", "z")),
      (2L, Seq("x", "y", "q")),
      (3L, Seq("q", "q", "q")) // equal-neighbor pairs are not candidates
    ).toDF("doc_id", "toks")
    val best = TextSearch.bpeTopPair(docs, "toks").collect().head
    assert(best.getString(0) == "x" && best.getString(1) == "y" &&
      best.getLong(2) == 3L, best)
    val merged = TextSearch
      .bpeApplyMerges(docs, "toks", TextSearch.bpeTopPair(docs, "toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(merged(1L) == Seq("x y", "x y", "z"), merged(1L))
    assert(merged(2L) == Seq("x y", "q"))
    assert(merged(3L) == Seq("q", "q", "q"), "l = r pairs never merge")
    val before = docs.select(sum(size(col("toks")))).collect().head.getLong(0)
    val after = merged.values.map(_.size).sum
    assert(after == before - 3, s"$before -> $after")
    // partitioning independence of the winner
    val b7 = TextSearch.bpeTopPair(docs.repartition(7), "toks")
      .collect().head
    assert(b7.getString(0) == "x" && b7.getString(1) == "y" &&
      b7.getLong(2) == 3L)
  }

  test("bpe tuple identity keeps stacked merged units unambiguous " +
    "(the case a flat space-joined key conflates)") {
    // both docs "spell" a b c, but as DIFFERENT unit pairs: a flat
    // "a b c" key would conflate them into one count of 5
    val docs = Seq(
      (1L, Seq("a b", "c")), (2L, Seq("a b", "c")), (3L, Seq("a b", "c")),
      (4L, Seq("a", "b c")), (5L, Seq("a", "b c"))
    ).toDF("doc_id", "toks")
    val counts = TextSearch.bpePairCounts(docs, "toks").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(counts == Map(("a b", "c") -> 3L, ("a", "b c") -> 2L))
    // the rewrite merges ONLY the winning tuple's docs
    val merged = TextSearch
      .bpeApplyMerges(docs, "toks", TextSearch.bpeTopPair(docs, "toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(merged(1L) == Seq("a b c"))
    assert(merged(4L) == Seq("a", "b c"), "losing tuple must stay unmerged")
  }

  test("bpeTopPairs: rank-based conflict filter keeps the batch " +
    "token-disjoint; one pass applies all selected merges") {
    // counts: (a,b)=5 > (b,c)=4 > (d,e)=3 > (e,f)=2 > (g,h)=1.
    // top-4 = first four; (b,c) conflicts with (a,b) via b, (e,f) with
    // (d,e) via e -> selected = (a,b) rn=1 and (d,e) rn=3.
    val docs = (
      (1 to 5).map(i => (i.toLong, Seq("a", "b"))) ++
      (6 to 9).map(i => (i.toLong, Seq("b", "c"))) ++
      (10 to 12).map(i => (i.toLong, Seq("d", "e"))) ++
      (13 to 14).map(i => (i.toLong, Seq("e", "f"))) ++
      Seq((15L, Seq("g", "h")))
    ).toDF("doc_id", "toks")
    val sel = TextSearch.bpeTopPairs(docs, "toks", k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(sel == Set((1, "a", "b"), (3, "d", "e")), sel)
    // the one-pass rewrite merges both selected pairs, leaves conflicts
    val merged = TextSearch.bpeApplyMerges(docs, "toks",
        TextSearch.bpeTopPairs(docs, "toks", k = 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(merged(1L) == Seq("a b"))
    assert(merged(6L) == Seq("b", "c")) // conflicted pair not merged
    assert(merged(10L) == Seq("d e"))
    assert(merged(13L) == Seq("e", "f"))
  }

  test("rrfFuse: shared ids sum both reciprocal terms, absent ids keep " +
    "one term and a null rank, order is fused score then id") {
    val bm = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val fused = TextSearch.rrfFuse(Seq(bm, vec), "id", k = 10).collect()
    assert(fused.map(_.getAs[Long]("id")).toSeq == Seq(2L, 1L, 3L),
      "doc in both lists wins; ties broken by id")
    val byId = fused.map(r => r.getAs[Long]("id") ->
      (Option(r.getAs[Integer]("rank0")), Option(r.getAs[Integer]("rank1")),
        r.getAs[Double]("rrf"))).toMap
    def rr(terms: Double*) = BigDecimal(terms.sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(2L) == ((Some(2), Some(1), rr(1.0 / 62, 1.0 / 61))))
    assert(byId(1L) == ((Some(1), None, rr(1.0 / 61))))
    assert(byId(3L) == ((None, Some(2), rr(1.0 / 62))))
  }

  test("oovRate: top-V vocabulary is frequency-then-token deterministic; " +
    "per-doc oov counts tokens outside it; empty docs vanish") {
    val docs = Seq(
      (1L, "a a a b"), // all in the top-2 vocab {a, b}
      (2L, "a b c d"), // c and d are OOV
      (3L, "c c b b"), // b ties a on count 2 after doc edits? see below
      (4L, "")).toDF("doc_id", "text")
    // counts: a=4, b=4, c=3, d=1 -> top-2 = {a, b} (no tie at the cut)
    val out = TextSearch.oovRate(docs, "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ntok"), r.getAs[Long]("oov"))).toMap
    assert(out == Map(1L -> ((4L, 0L)), 2L -> ((4L, 2L)), 3L -> ((4L, 2L))),
      s"got $out")
    assert(!out.contains(4L), "zero-token docs emit no row")
  }

  test("chunkWindows: stride-2 windows of 3 cover [0,1],[2,3],[4] shapes " +
    "and trailing chunks shorten") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextSearch.chunkWindows(docs, "text",
        window = 3, stride = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("off"),
        r.getAs[Seq[String]]("chunk")))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      (1L, 0, Seq("t1", "t2", "t3")),
      (1L, 1, Seq("t3", "t4", "t5")),
      (1L, 2, Seq("t5")),
      (2L, 0, Seq("x"))), s"got ${rows.toSeq}")
  }

  test("hashedLinearScore: wsum equals the hand-computed md5-chain weight " +
    "sum exactly, and is invariant under repartitioning") {
    import graft.functions.hashing
    val docs = Seq((1L, "alpha beta beta gamma"), (2L, "alpha"), (3L, ""))
      .toDF("doc_id", "text")
    def weight(t: String): BigDecimal = {
      val idx = hashing.md5Long(t) % 4096
      BigDecimal(hashing.md5Long(s"qw_$idx") % 2001 - 1000) / 1000
    }
    val expect1 = weight("alpha") + weight("beta") * 2 + weight("gamma")
    for (parts <- Seq(1, 7)) {
      val out = TextSearch.hashedLinearScore(docs.repartition(parts),
        "text", dim = 4096).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("ntok"), BigDecimal(r.getAs[java.math.BigDecimal]("wsum")))).toMap
      assert(out(1L) == ((4L, expect1)), s"parts=$parts got ${out(1L)}")
      assert(out(2L) == ((1L, weight("alpha"))))
      assert(!out.contains(3L), "empty docs emit no row")
      out.values.foreach { case (n, w) =>
        assert(w.abs <= BigDecimal(n), "weights live in [-1, 1]") }
    }
  }

  test("t19 perplexity tiers: every language has all three buckets and " +
    "strictly increasing mean cross-entropy head < middle < tail") {
    val rows = graft.SparkEntry.queries("t19_perplexity_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, tiers) =>
      val m = tiers.map(t => t._2 -> t._4).toMap
      assert(m.keySet == Set("head", "middle", "tail"), s"$lang tiers $m")
      assert(m("head") < m("middle") && m("middle") < m("tail"),
        s"$lang means not monotone: $m")
      // terciles: no bucket may hold less than a fifth or more than half
      // of the language (ties can shift the thirds, but not that far)
      val n = tiers.map(_._3).sum.toDouble
      tiers.foreach { t =>
        assert(t._3 / n > 0.2 && t._3 / n < 0.5, s"$lang skewed: $tiers")
      }
    }
  }

  test("bpeEncode with the learned table replays the training rewrite " +
      "exactly; round order matters") {
    import graft.functions.textstats
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = Checkpoints.checkpoint(
      docs.select(col("doc_id"), textstats.tokens(col("text")).as("toks")))
    var train = base
    val merges = (1 to 3).map { i =>
      val sel = Checkpoints.checkpoint(
        TextSearch.bpeTopPairs(train, "toks", k = 4))
      train = Checkpoints.checkpoint(
        TextSearch.bpeApplyMerges(train, "toks", sel))
      sel.select(lit(i).as("round"), col("rn"), col("l"), col("r"))
    }.reduce(_.unionByName(_))
    def toksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.select(col("doc_id"), col("toks")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // Identity: encoding the training corpus with the learned table is the
    // progressive training rewrite — token for token.
    assert(toksOf(TextSearch.bpeEncode(base, "toks", merges, rounds = 3))
      === toksOf(train))
    // Round order matters: on a planted "a b c ..." corpus, round 1 fuses
    // (a, b) and round 2 must merge the FUSED unit with c — a merge table
    // applied out of order (or flattened into one batch) could not produce
    // it, so bpeEncode's sequential replay is essential, not stylistic.
    val planted = Checkpoints.checkpoint(
      Seq.tabulate(8)(i => (i.toLong, Seq.fill(6)("a b c").mkString(" ")))
        .toDF("doc_id", "text")
        .select(col("doc_id"), textstats.tokens(col("text")).as("toks")))
    var ptrain = planted
    val pmerges = (1 to 2).map { i =>
      val sel = Checkpoints.checkpoint(
        TextSearch.bpeTopPairs(ptrain, "toks", k = 1))
      ptrain = Checkpoints.checkpoint(
        TextSearch.bpeApplyMerges(ptrain, "toks", sel))
      sel.select(lit(i).as("round"), col("rn"), col("l"), col("r"))
    }.reduce(_.unionByName(_))
    val r2 = pmerges.filter(col("round") === 2).collect()
    assert(r2.length === 1 && (r2(0).getAs[String]("l").contains(" ") ||
      r2(0).getAs[String]("r").contains(" ")),
      s"round 2 should merge over round 1's fused unit: ${r2.toSeq}")
    assert(toksOf(TextSearch.bpeEncode(planted, "toks", pmerges, rounds = 2))
      === toksOf(ptrain))
  }
}
