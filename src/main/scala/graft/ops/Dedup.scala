package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{hashing, textstats}

/** Document-deduplication operators for training-data pipelines (north-star
  * extension; the reference's only dedup is exact SHA-256 file dedup,
  * `perustats/inei/organizer.py:199-248` — generalized here to the standard
  * large-corpus family: exact hash, n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Scale design (100 TB):
  *  - Nothing here collects to the driver; every step is a column transform
  *    or a shuffle on a key whose cardinality grows with the corpus (shingle,
  *    band bucket, simhash band), never an O(n²) cross join.
  *  - MinHash signatures are one `groupBy(id)` with NumHashes min-aggregates
  *    (map-side partial min ⇒ the shuffle carries one row per (id, shingle)
  *    pre-combined to one row per id per partition).
  *  - LSH candidate generation joins on (band, bandKey): only documents
  *    agreeing on a full band collide, so bucket sizes stay small and the
  *    pair blow-up is bounded by genuinely similar groups. Hot buckets
  *    (boilerplate shingles) are the known skew risk — cap with
  *    `maxBucketSize` which drops pathological buckets (standard practice:
  *    a bucket of 10k docs contributes 50M pairs and no information).
  *  - Exact-Jaccard verification joins only candidate pairs back to shingle
  *    sets, so the expensive exact step runs on the LSH-filtered set.
  */
object Dedup {

  /** (id, shingle) exploded table; NOT distinct (min/minhash are multiset-
    * safe and skipping the distinct saves a shuffle — dedupe only where set
    * semantics matter, i.e. Jaccard).
    *
    * The input is hash-repartitioned by id BEFORE the expensive
    * tokenize/shingle/hash work, for two reasons that both matter at scale:
    * (1) the raw-document shuffle is ~3× smaller than shuffling the exploded
    * shingle rows later, and every downstream per-id aggregation
    * (signatures, distinct sets, simhash bits) then reuses the partitioning
    * with NO further exchange; (2) a corpus arriving as a few big files
    * would otherwise serialize the CPU-heavy shingling into a handful of
    * input splits (measured 2.5× on the bench corpus, which is one parquet
    * file). The explicit partition count pins the exchange so AQE does not
    * coalesce the small-bytes/high-CPU map work back onto one core. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, col(idCol)).select(col(idCol).as("id"),
      explode(textstats.shingles(textstats.tokens(col(textCol)), k)).as("s"))
  }

  /** (id, h) hashed-shingle table: every downstream set operation (distinct,
    * Jaccard intersection join, SimHash bits) runs on 8-byte longs instead
    * of ~40-byte shingle strings — half the shuffle volume and cheap join
    * keys. Hash collisions conflate shingles identically in the DuckDB
    * oracle (same md5-derived hash), so results stay bit-identical. */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, hash: Column => Column = hashing.h64): DataFrame =
    shingleTable(df, idCol, textCol, k)
      .select(col("id"), hash(col("s")).as("h"))

  /** MinHash signatures: one row per id with columns m0..m{NumHashes-1}.
    * Single shuffle on id with map-side partial mins. */
  /** MinHash signatures from a hashed-shingle table (id, h). */
  def minhashSignatures(hashed: DataFrame): DataFrame = {
    val aggs = (0 until hashing.NumHashes)
      .map(j => min(hashing.perm(j, col("h") % lit(hashing.P))).as(s"m$j"))
    hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (id, band, bandKey) — documents sharing a full band of
    * Rows consecutive signature values land in the same bucket. */
  def lshBands(signatures: DataFrame): DataFrame =
    lshBandsConfig(signatures, hashing.Bands, hashing.Rows)

  /** LSH banding with an EXPLICIT (bands × rows) geometry over the same
    * signature columns m0..m{NumHashes-1} — the calibration surface: the
    * candidate probability for a pair at Jaccard s is 1 − (1 − s^rows)^bands
    * (the S-curve), so sweeping geometries against exact-Jaccard ground
    * truth on a corpus sample is how production picks its banding before
    * a 100 TB run (d18). Consumes the first `bands · rows ≤ NumHashes`
    * signature values. */
  def lshBandsConfig(signatures: DataFrame, bands: Int, rows: Int): DataFrame = {
    require(bands >= 1 && rows >= 1 && bands * rows <= hashing.NumHashes,
      s"need 1 <= bands*rows <= ${hashing.NumHashes}; got $bands x $rows")
    val bandStructs = (0 until bands).map { b =>
      val ks = (b * rows until (b + 1) * rows).map(j => col(s"m$j"))
      struct(lit(b).as("band"), concat_ws(",", ks: _*).as("bandKey"))
    }
    signatures.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bandKey").as("bandKey"))
  }

  /** Drop degenerate LSH buckets larger than `maxBucketSize` (0 = keep
    * all): a 10k-doc boilerplate bucket contributes 50M pairs and no
    * information. Shared by the self-join and cross-corpus candidate
    * generators. */
  def capBuckets(bands: DataFrame, maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) bands
    else {
      val counts = bands.groupBy("band", "bandKey")
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      bands.join(counts.select("band", "bandKey"), Seq("band", "bandKey"))
    }

  /** Candidate pairs (a < b) from LSH buckets; `maxBucketSize` guards the
    * quadratic blow-up of degenerate buckets at scale (0 = unlimited). */
  def lshCandidatePairs(bands: DataFrame, maxBucketSize: Int = 0): DataFrame = {
    val sized = capBuckets(bands, maxBucketSize)
    sized.alias("x").join(sized.alias("y"),
        col("x.band") === col("y.band") &&
          col("x.bandKey") === col("y.bandKey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs: join each side back to its
    * distinct hashed-shingle set, count the intersection, divide by the
    * union. `candidates` restricts the quadratic step to pre-filtered
    * pairs; pass all-pairs-sharing-a-shingle for the exact (no-LSH)
    * variant. */
  def jaccardPairs(hashed: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame =
    // One Jaccard tail for the self-join and cross-corpus paths: the two
    // side plans are structurally identical here, so Spark's canonical-
    // plan exchange reuse dedups the distinct exactly as a shared `val`
    // would (A/B-measured; an eager localCheckpoint was a net LOSS).
    crossJaccardPairs(hashed, hashed, candidates, threshold)

  /** Exact all-pairs n-gram Jaccard ≥ threshold. Intersection counts come
    * straight off the inverted-index self-join (each shared shingle is one
    * joined row, so `count` per pair IS |A∩B|) — one shuffle join + one
    * aggregation, no candidate-distinct pass. At corpus scale precede with
    * LSH (`minhashLshPairs`) instead: a tiny shared vocabulary makes nearly
    * every pair share some shingle. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame =
    pairOverlapStats(df, idCol, textCol, k)
      .withColumn("jac",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jac") >= threshold)
      .select("a", "b", "jac")

  /** Shared inverted-index core of the exact pairwise set-overlap family:
    * (a, b, i, na, nb) with i = |A∩B| straight off the self-join (each
    * shared shingle is one joined row) and na/nb the distinct set sizes.
    * One score expression on top makes it Jaccard or containment — keeping
    * the join/candidate machinery in ONE place so skew/capping fixes land
    * on both detectors at once. */
  private def pairOverlapStats(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // sizes + the self-join read the sets three times — materialize once.
    val sets = Checkpoints.checkpoint(
      hashedShingles(df, idCol, textCol, k).distinct())
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sets.alias("x").join(sets.alias("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
  }

  /** Exact all-pairs n-gram CONTAINMENT (|A∩B| / min(|A|,|B|)): the
    * asymmetric near-dup mode — a short document embedded verbatim in a
    * long one scores 1.0 here but low symmetric Jaccard, so this is the
    * detector for quote/boilerplate inclusion (the Lee et al. 2022 dedup
    * taxonomy's substring case, approximated at shingle granularity).
    * Same inverted-index equi-join shape as [[ngramJaccardPairs]]. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame =
    pairOverlapStats(df, idCol, textCol, k)
      .withColumn("containment",
        round(col("i").cast("double") / least(col("na"), col("nb")), 4))
      .filter(col("containment") >= threshold)
      .select("a", "b", "containment")

  /** Cross-corpus exact Jaccard over candidate (a = left id, b = right id)
    * pairs: each side joins back to its OWN distinct hashed-shingle set.
    * The cross twin of [[jaccardPairs]]. */
  def crossJaccardPairs(hashedL: DataFrame, hashedR: DataFrame,
      candidates: DataFrame, threshold: Double): DataFrame = {
    val setsL = hashedL.distinct()
    val setsR = hashedR.distinct()
    val sizesL = setsL.groupBy("id").agg(count(lit(1)).as("na"))
    val sizesR = setsR.groupBy("id").agg(count(lit(1)).as("nb"))
    val inter = candidates
      .join(setsL.select(col("id").as("a"), col("h")), Seq("a"))
      .join(setsR.select(col("id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    inter
      .join(sizesL.select(col("id").as("a"), col("na")), "a")
      .join(sizesR.select(col("id").as("b"), col("nb")), "b")
      .withColumn("jac",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jac") >= threshold)
      .select("a", "b", "jac")
  }

  /** BENCHMARK DECONTAMINATION — cross-corpus near-dup detection: MinHash
    * signatures and LSH bands are built per side, candidates come from the
    * cross-side band equi-join only (no within-side pairs), and every
    * candidate is exact-Jaccard verified against the two shingle sets.
    * Returns (a = `left` id, b = `right` id, jac) — the eval-set rows to
    * drop from `right` (or training docs to quarantine in `left`) before
    * training. Same scale shape as [[minhashLshPairs]]: the pair blow-up is
    * bounded by band buckets, never |L|·|R|. */
  def crossCorpusNearDups(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, k: Int = 3, threshold: Double = 0.8,
      maxBucketSize: Int = 0, hash: Column => Column = hashing.h64): DataFrame = {
    // Checkpoint per side for the same reason as [[minhashLshPairs]]: each
    // side's shingle scan feeds its band branch and its verification side.
    val shL = Checkpoints.checkpoint(
      hashedShingles(left, idCol, textCol, k, hash))
    val shR = Checkpoints.checkpoint(
      hashedShingles(right, idCol, textCol, k, hash))
    val bandsL = lshBands(minhashSignatures(shL))
    val bandsR = lshBands(minhashSignatures(shR))
    val cands = capBuckets(bandsL, maxBucketSize).alias("x")
      .join(capBuckets(bandsR, maxBucketSize).alias("y"),
        col("x.band") === col("y.band") && col("x.bandKey") === col("y.bandKey"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    crossJaccardPairs(shL, shR, cands, threshold)
  }

  /** MinHash + LSH near-dup pairs, exact-Jaccard verified. `hash` picks the
    * shingle hash: [[hashing.h64]] (md5-derived, oracle-replayable — the
    * default so checked queries stay bit-verifiable) or [[hashing.xxh60]]
    * (the production choice, ~3× cheaper; the verified output is identical
    * for any collision-free hash because banding at near-dup thresholds has
    * full recall and Jaccard scores see only set identity). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8, maxBucketSize: Int = 0,
      hash: Column => Column = hashing.h64): DataFrame = {
    // The hashed-shingle table feeds the signature branch AND both sides of
    // the verification join. Checkpoint it once: leaving it lazy re-runs
    // the tokenize+shingle+hash scan per branch whenever Catalyst's
    // exchange reuse fails to unify the aliased subtrees — nondeterministic
    // 2-3× spikes (re-A/B'd round 5: checkpoint is ~30% faster at sf0.1
    // AND kills the spike mode; an earlier smaller-corpus A/B went the
    // other way, superseded). The materialized table is (id, int64) rows —
    // the compact form of the corpus the whole pipeline re-reads.
    val sh = Checkpoints.checkpoint(hashedShingles(df, idCol, textCol, k, hash))
    val cands = lshCandidatePairs(lshBands(minhashSignatures(sh)), maxBucketSize)
    jaccardPairs(sh, cands, threshold)
  }

  /** Connected components over an undirected pair set (a, b): every node
    * labeled with the minimum id reachable from it. This is the survivor
    * step of corpus dedup — keep one doc (the min id) per component of
    * near-duplicates.
    *
    * Iterative min-label propagation over DataFrames: each round joins
    * labels across edges and keeps the row-wise minimum, until a fixpoint.
    * Rounds = graph diameter ≤ log n after path doubling would kick in —
    * near-dup components are tiny (pairs/triangles), so plain propagation
    * converges in 2-3 rounds; the iteration cap guards pathological chains
    * (for web-scale graphs swap in large-star/small-star, same contract).
    * Each round's result is checkpointed ([[Checkpoints]] — executor-local
    * by default, reliable when `spark.graft.checkpoint.dir` is set; on a
    * real cluster the reliable mode is the only one that survives executor
    * loss across the rounds): the lineage would otherwise
    * double per round and recompute the whole prefix at every action.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    // Materialize the PAIR LIST first: `pairs` is typically the output of a
    // whole LSH pipeline, and both branches of the symmetrization union
    // would otherwise re-execute that DAG whenever Catalyst's exchange
    // reuse fails to unify them (nondeterministic, and 2× the dominant
    // cost). The checkpointed pair set is tiny; the union over it is a
    // narrow recompute every round's joins read for free.
    val p0 = Checkpoints.checkpoint(pairs.select(col("a"), col("b")))
    val sym = p0.select(col("a").as("src"), col("b").as("dst"))
      .union(p0.select(col("b").as("src"), col("a").as("dst")))
    // Seed labels with min(id, min neighbor) — exactly what the first
    // propagation round would compute from identity labels, for the cost
    // of one aggregation instead of a full join round. Near-dup components
    // (pairs/triangles) then converge in a single confirming round.
    var labels = Checkpoints.checkpoint(
      sym.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("__mn"))
        .select(col("id"), least(col("id"), col("__mn")).as("root")))
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("root")).as("nroot"))
      // Pointer doubling: also adopt the label OF my current label, halving
      // the remaining path to the component minimum each round — long
      // chains converge in O(log diameter) rounds instead of O(diameter).
      val viaRoot = labels.alias("l1")
        .join(labels.alias("l2"), col("l1.root") === col("l2.id"))
        .select(col("l1.id").as("id"), col("l2.root").as("rroot"))
      // The round's checkpoint carries the previous label alongside the new
      // one, so the convergence probe is a filter over already-materialized
      // data — no extra join stage per round.
      val next = Checkpoints.checkpoint(labels
        .join(viaNeighbor, Seq("id"), "left")
        .join(viaRoot, Seq("id"), "left")
        .select(col("id"), col("root").as("__prev"),
          least(col("root"),
            coalesce(col("nroot"), col("root")),
            coalesce(col("rroot"), col("root"))).as("root")))
      converged = next.filter(col("root") =!= col("__prev")).isEmpty
      labels = next.select(col("id"), col("root"))
      round += 1
    }
    // A silent partial labeling would split components; fail loudly instead.
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Survivor selection: canonical (kept) id per document that appears in a
    * near-dup pair — docs absent from `pairs` are implicitly their own
    * survivor. */
  def survivors(pairs: DataFrame): DataFrame =
    connectedComponents(pairs).select(col("id"), col("root").as("keep"))

  /** Apply dedup to the corpus: drop every document that belongs to a
    * near-dup component and is not its canonical (min-id) member. One
    * anti-join against the (small) non-survivor set. */
  def dedupCorpus(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dropped = survivors(pairs)
      .filter(col("id") =!= col("keep"))
      .select(col("id").as(idCol))
    df.join(broadcast(dropped), Seq(idCol), "left_anti")
  }

  /** Number of SimHash bits (kept < 63 so the signature stays a positive
    * signed long in both engines). */
  val SimhashBits = 60

  /** SimHash signature per document over its distinct k-shingle set: bit b
    * is set when more shingle hashes have bit b set than not. Shingles (not
    * unigrams) keep the signature discriminative when the vocabulary is
    * small. One shuffle (groupBy id with 60 sum-aggregates, map-side
    * combined). */
  def simhash(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
      hash: Column => Column = hashing.h64): DataFrame = {
    val tok = hashedShingles(df, idCol, textCol, k, hash).distinct()
    val bitSums = (0 until SimhashBits).map(b =>
      sum(when(expr(s"(h >> $b) % 2") === 1, 1).otherwise(-1)).as(s"b$b"))
    val withSums = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimhashBits)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    withSums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via lossless
    * multi-index (combination) blocking, the Manku et al. WWW'07 layout
    * generalized to any (maxDist, keyBlocks): the 60 bits are split into
    * m = maxDist + keyBlocks disjoint segments; a pair within maxDist has
    * its ≤ maxDist differing bits in at most maxDist segments, so it agrees
    * EXACTLY on ≥ keyBlocks whole segments — and therefore on at least one
    * of the C(m, keyBlocks) keyBlocks-sized segment COMBINATIONS. Each
    * combination is one probe table keyed by the packed concatenation of
    * its segment values; candidates are an equi-join on (combo, key) and
    * the final Hamming filter makes the result identical to brute force.
    *
    * keyBlocks is the selectivity/replication dial, and sizing it is part
    * of the operator's contract: probe keys carry ~keyBlocks·60/m bits, so
    * buckets hold ~n/2^(60·keyBlocks/m) docs and candidate volume scales as
    * C(m,keyBlocks)·n²/2^(60·keyBlocks/m) for near-uniform signatures.
    * keyBlocks=1 is plain pigeonhole: at maxDist=10 each key carries only
    * ~5.5 bits (≤64 buckets), so candidates grow as n²/64 — a quadratic
    * scale-killer dressed as an equi-join. keyBlocks=2 at maxDist=10 gives
    * 10-bit keys (C(12,2)=66 tables); at maxDist=5, 17-bit keys (C(7,2)=21).
    * Size keyBlocks so 2^(60·keyBlocks/m) ≳ n/1000; the C(m,keyBlocks)×
    * row replication is the (linear) price of the (quadratic) pruning.
    *
    * The signature table is checkpointed before the self-join: the 60-sum
    * aggregate behind it would otherwise sit on BOTH join sides and
    * re-execute whenever Catalyst's exchange reuse fails to unify the
    * aliased subtrees (nondeterministic, and 2× the dominant cost). */
  def simhashPairs(signatures: DataFrame, maxDist: Int,
      keyBlocks: Int = 1): DataFrame = {
    require(keyBlocks >= 1 && maxDist >= 0, "need keyBlocks >= 1, maxDist >= 0")
    // m may exceed SimhashBits (maxDist near 60, i.e. brute force): the
    // surplus segments get width 0, which keeps the guarantee (a 0-bit
    // segment is trivially clean) and degenerates gracefully to all-pairs.
    val m = maxDist + keyBlocks
    val bounds = (0 to m).map(i => i * SimhashBits / m)
    // Packed value of segment i: (simhash >> off) & mask, width w(i).
    def segVal(i: Int): String = {
      val mask = (1L << (bounds(i + 1) - bounds(i))) - 1
      s"((simhash >> ${bounds(i)}) & $mask)"
    }
    // One probe struct per keyBlocks-combination: key = the combination's
    // segment values packed side by side into one long (total width
    // 60·keyBlocks/m < 60 bits, so it always fits).
    val comboStructs = (0 until m).combinations(keyBlocks).zipWithIndex.map {
      case (segs, idx) =>
        val packed = segs.map(segVal).zip(
            segs.scanLeft(0)((acc, i) => acc + bounds(i + 1) - bounds(i)))
          .map { case (v, shift) => s"($v << $shift)" }.mkString(" + ")
        struct(lit(idx).as("combo"), expr(packed).as("key"))
    }.toSeq
    val sig = Checkpoints.checkpoint(
      signatures.select(col("id"), col("simhash")))
    val banded = sig.select(col("id"), col("simhash"),
        explode(array(comboStructs: _*)).as("c"))
      .select(col("id"), col("simhash"),
        col("c.combo").as("combo"), col("c.key").as("key"))
    banded.alias("x").join(banded.alias("y"),
        col("x.combo") === col("y.combo") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        expr("bit_count(x.simhash ^ y.simhash)").cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Passage-level exact dedup (C4/RefinedWeb-style): each document is cut
    * into consecutive non-overlapping k-token passages; across the whole
    * corpus only the FIRST occurrence of each distinct passage (smallest
    * (id, pos)) is kept. Returns one row per passage with its position and
    * a `kept` flag, all non-text input columns preserved, so callers can
    * either reassemble the scrubbed documents or aggregate retention stats.
    *
    * Scale design: the first-occurrence winner per passage is computed as a
    * `min(struct(id, pos))` AGGREGATE keyed by the passage hash — unlike a
    * row_number window, the partial min combines map-side, so a boilerplate
    * passage repeated a billion times collapses to one row per map task
    * before the shuffle. The flag join back is then an equi-join against
    * one row per distinct passage; a skewed probe side there is AQE's
    * standard split case. Passage cutting itself is row-local array
    * arithmetic (no explode until the single keyed pass).
    */
  def passageDedup(df: DataFrame, idCol: String, textCol: String, k: Int,
      hash: Column => Column = hashing.h64): DataFrame = {
    val tok = textstats.tokens(col(textCol))
    val passages =
      when(size(tok) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(tok) - 1) / lit(k)).cast("int")),
          i => array_join(slice(tok, i * k + 1, lit(k)), " ")))
    val keep = df.columns.filterNot(_ == textCol).map(col)
    val exploded = df
      .select(keep :+ posexplode(passages).as(Seq("pos", "passage")): _*)
      .withColumn("__ph", hash(col("passage")))
    val firsts = exploded.groupBy(col("__ph"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
    exploded.join(firsts, "__ph")
      .withColumn("kept", struct(col(idCol), col("pos")) === col("__first"))
      .drop("__ph", "__first")
  }

  /** Corpus-level BOILERPLATE removal — the document-frequency twin of
    * [[passageDedup]]'s first-occurrence rule (RefinedWeb's "line appears in
    * many documents" filter): a k-token passage occurring in at least
    * `minDocs` DISTINCT documents is boilerplate (navigation chrome, cookie
    * banners, license headers) and is removed from EVERY document — no
    * first copy survives, unlike passageDedup where exactly one does.
    * Returns the same shape as passageDedup (one row per passage, `kept`
    * flag, non-text columns preserved) so [[reassembleKept]] rebuilds the
    * scrubbed corpus unchanged.
    *
    * Scale design: the document frequency per passage is computed as a
    * distinct (hash, id) projection — partial-deduplicated map-side —
    * followed by a count keyed on the passage hash, so a passage repeated a
    * billion times collapses before the exchange; the flag join back is an
    * equi-join against one row per distinct passage (broadcast-able when
    * the boilerplate universe is small, AQE's call). No window anywhere. */
  def boilerplateScrub(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int,
      hash: Column => Column = hashing.h64): DataFrame = {
    require(minDocs > 1, "minDocs must exceed 1 or everything is boilerplate")
    val tok = textstats.tokens(col(textCol))
    val passages =
      when(size(tok) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(tok) - 1) / lit(k)).cast("int")),
          i => array_join(slice(tok, i * k + 1, lit(k)), " ")))
    val keep = df.columns.filterNot(_ == textCol).map(col)
    val exploded = df
      .select(keep :+ posexplode(passages).as(Seq("pos", "passage")): _*)
      .withColumn("__ph", hash(col("passage")))
    val docFreq = exploded.select(col("__ph"), col(idCol)).distinct()
      .groupBy(col("__ph")).agg(count(lit(1)).as("__ndocs"))
    exploded.join(docFreq, "__ph")
      .withColumn("kept", col("__ndocs") < lit(minDocs))
      .drop("__ph", "__ndocs")
  }

  /** WITHIN-document repeated-passage removal — the rewrite form of the
    * Gopher repetition SIGNALS: t9 measures a document's duplicated
    * n-gram mass, this deletes it. The document's non-overlapping k-token
    * passages keep only their FIRST in-document occurrence and reassemble
    * in order. Entirely row-local — one indexed higher-order filter per
    * row, no explode, no join, no shuffle of any kind — which is the 100
    * TB point: corpus-WIDE passage dedup ([[passageDedup]] /
    * [[reassembleKept]]) must shuffle on the passage hash, while the
    * intra-document form is free map work a pipeline should always run
    * first. Adds `passages` (count before), `kept_passages` (count
    * after), and `rewritten` (the scrubbed text) to `df`. Idempotent. */
  def intraDocDedup(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "passage length must be positive")
    val tok = textstats.tokens(col(textCol))
    val passages =
      when(size(tok) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(tok) - 1) / lit(k)).cast("int")),
          i => array_join(slice(tok, i * k + 1, lit(k)), " ")))
    df.withColumn("passages", passages)
      .withColumn("__kept", filter(col("passages"),
        (x, i) => array_position(col("passages"), x) === (i + lit(1))))
      .withColumn("rewritten", array_join(col("__kept"), " "))
      .withColumn("kept_passages", size(col("__kept")))
      .withColumn("passages", size(col("passages")))
      .drop("__kept")
  }

  /** Variable-length EXACT-SUBSTRING dedup — the Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr) shape, re-expressed distributed: any duplicated token
    * run of length ≥ k is removed wherever it is not the corpus-wide
    * first occurrence, at TOKEN granularity. [[passageDedup]]'s fixed
    * k-token grid both misses duplicates straddling grid boundaries and
    * rounds every removal to grid multiples; this operator marks the
    * maximal duplicated span exactly.
    *
    * Mechanism (the map-reduce stand-in for the paper's single-machine
    * suffix array, which cannot shard): stride-1 overlapping k-token
    * shingles; per distinct shingle the corpus-wide first occurrence —
    * min(struct(id, pos)), the same map-side-combining aggregate kernel
    * as [[passageDedup]] — wins; every token covered by a NON-winning
    * shingle occurrence lies inside a duplicated run of ≥ k tokens, and
    * the per-document union of those [pos, pos+k-1] windows (adjacent /
    * overlapping intervals coalesced by a row-local fold) is exactly the
    * set of maximal duplicated spans. A duplicated block of L ≥ k tokens
    * yields ONE span of exactly L tokens — its L−k+1 duplicated shingles
    * merge — while runs shorter than k are untouched (k is the minimum
    * match length, the paper's 50-token knob).
    *
    * Returns one row per input document: all non-text columns, plus
    * `n_tokens`, `spans` (array<array<int>> of [start, end] inclusive
    * 0-based token bounds, position-ordered), `n_spans`, `dup_tokens`,
    * and `rewritten` (the document with every span's tokens removed).
    *
    * Scale: the shingle table is the k× token amplification every
    * n-gram operator here pays (8-byte hashes keep the exchange lean);
    * ONE shuffle keyed by shingle hash with partial min combine — a
    * shingle repeated a billion times collapses to one row per map task
    * — then one equi-join back and one groupBy(id) to collect each
    * document's duplicated positions (bounded by the document's own
    * length, the same per-doc-state assumption as reassembly). The
    * interval fold and rewrite are row-local HOFs, no window anywhere. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String, k: Int,
      hash: Column => Column = hashing.h64): DataFrame = {
    require(k > 1, "minimum duplicate length must exceed 1 token")
    val withToks = df.withColumn("__toks", textstats.tokens(col(textCol)))
    val exploded = withToks
      .select(col(idCol),
        posexplode(textstats.shingles(col("__toks"), k)).as(Seq("pos", "s")))
      .select(col(idCol), col("pos"), hash(col("s")).as("__sh"))
    val firsts = exploded.groupBy(col("__sh"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
    val dupPos = exploded.join(firsts, "__sh")
      .filter(struct(col(idCol), col("pos")) =!= col("__first"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__dups"))
    val lastOf = (acc: Column) => element_at(acc, -1)
    val spans = aggregate(
      coalesce(col("__dups"), array().cast("array<int>")),
      array().cast("array<array<int>>"),
      (acc, p) => when(
          size(acc) === 0 || p > element_at(lastOf(acc), 2) + 1,
          concat(acc, array(array(p, p + lit(k - 1)))))
        .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
          array(array(element_at(lastOf(acc), 1), p + lit(k - 1))))))
    val covered = (i: Column) => exists(col("spans"),
      a => i >= element_at(a, 1) && i <= element_at(a, 2))
    withToks.join(dupPos, Seq(idCol), "left_outer")
      .withColumn("spans", spans)
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("n_spans", size(col("spans")))
      .withColumn("dup_tokens", aggregate(col("spans"), lit(0),
        (acc, a) => acc + element_at(a, 2) - element_at(a, 1) + 1))
      .withColumn("rewritten", array_join(
        filter(col("__toks"), (_, i) => !covered(i)), " "))
      .drop("__toks", "__dups", textCol)
  }

  // ---- Bloom-prefiltered decontamination ----
  //
  // The 100 TB decontamination pattern: the eval/benchmark side is small
  // (millions of shingles), the train side is the 100 TB corpus. An exact
  // semi-join (e4) must shuffle every train shingle; a Bloom filter over
  // the eval hashes, broadcast to the mappers, lets ~all clean train
  // shingles drop BEFORE any exchange — only bloom-passing candidates
  // (true hits + the filter's false positives) reach the exact confirm
  // join, so the result stays exactly e4's while the shuffle shrinks by
  // the contamination rate.
  //
  // The filter is built from Spark built-ins only (no driver-side
  // `stat.bloomFilter` collect): probe positions come from the shared
  // md5-LCG permutation family, the bitmap is a bit_or aggregate packed
  // into ONE dense array<long> row, and membership is row-local shift/mask
  // math — all of it codegen'd, and all of it replayable bit-for-bit by
  // the DuckDB oracle (which pins the false-positive set too, not just
  // the exact result).
  //
  // Sizing: bits-per-item 10-16 keeps FP ~1%; a 10^9-shingle eval set at
  // 12 bits/item is a 1.5 GB bitmap — beyond the comfortable 1-row
  // broadcast, at which point shard the bitmap by hash prefix (bitmap per
  // shard, candidates join on prefix) or fall back to the plain semi-join.
  // The prefilter wins precisely when eval ≪ train, which is the
  // decontamination regime.

  /** ONE-row dense Bloom bitmap (`bits`: array<long>, length mBits/64) over
    * the `hCol` hash values: each value sets `numProbes` positions
    * `perm_j(h mod P) mod mBits`. Built with map-side-combined bit_or
    * partials — a repeated hash costs nothing extra. */
  def bloomBitmap(hashes: DataFrame, hCol: String, mBits: Int,
      numProbes: Int): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    require(numProbes > 0 && numProbes <= hashing.NumHashes,
      s"numProbes must be in [1, ${hashing.NumHashes}]")
    val words = mBits / 64
    val wordMasks = hashes
      .select(explode(array((0 until numProbes).map(j =>
        hashing.perm(j, pmod(col(hCol), lit(hashing.P))) % lit(mBits)): _*))
        .as("p"))
      .groupBy((col("p") / lit(64)).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("mask"))
    // Densify by completing the word domain with a range join and sorting
    // the collected (w, mask) structs — NOT by per-index map lookup:
    // element_at on a catalyst map is a linear entry scan, which makes the
    // dense build O(words²) on one task (measured 18 s for 16k words).
    hashes.sparkSession.range(words.toLong)
      .select(col("id").cast("int").as("w"))
      .join(wordMasks, Seq("w"), "left")
      .select(struct(col("w"), coalesce(col("mask"), lit(0L)).as("mask"))
        .as("wm"))
      .agg(collect_list(col("wm")).as("wms"))
      .select(transform(array_sort(col("wms")), s => s.getField("mask"))
        .as("bits"))
  }

  /** Filters `hashes` to the rows whose `hCol` value the bloom MIGHT
    * contain (all probe positions set). The bitmap arrives as a 1-row
    * broadcast cross join; the probe tests are row-local shift/mask math,
    * so clean rows die in the map stage with no exchange. No false
    * negatives by construction; false positives are the filter's — follow
    * with an exact semi-join when the result must be exact. */
  def bloomMightContain(bitmap: DataFrame, hashes: DataFrame, hCol: String,
      mBits: Int, numProbes: Int): DataFrame = {
    val pass = (0 until numProbes).map { j =>
      // pmod (both here and in the build): a SIGNED production hash
      // (raw xxhash64) would otherwise yield negative probe positions —
      // silently dropped words on the build side, end-of-array reads on
      // the probe side, i.e. false negatives. perm of a non-negative
      // value is non-negative, so only the input mod needs normalizing.
      val p = hashing.perm(j, pmod(col(hCol), lit(hashing.P))) % lit(mBits)
      (element_at(col("bits"), (p / lit(64)).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % lit(64)).cast("int"))) =!= lit(0L))
    }.reduce(_ && _)
    hashes.crossJoin(broadcast(bitmap)).filter(pass).drop("bits")
  }

  /** SHARDED Bloom bitmap — the same GLOBAL bit domain as [[bloomBitmap]]
    * split into `numShards` contiguous ranges: (shard, bits) rows with
    * mBits/numShards bits each. Bit placement is identical to the 1-row
    * build (global position p = perm_j(h mod P) mod mBits lands in shard
    * p div shardBits at local bit p mod shardBits), so the pass set — and
    * therefore the decontamination result — is bit-identical to the
    * unsharded filter; only the physical layout changes. This is the
    * escape hatch the 1-row build documents above: past ~1.5 GB the
    * single-row broadcast stops being comfortable, while a shard row
    * stays mBits/numShards/8 bytes however big the corpus gets. */
  def bloomBitmapSharded(hashes: DataFrame, hCol: String, mBits: Int,
      numProbes: Int, numShards: Int): DataFrame = {
    require(numShards > 0 && mBits % (64L * numShards) == 0,
      "mBits must be a positive multiple of 64*numShards")
    require(numProbes > 0 && numProbes <= hashing.NumHashes,
      s"numProbes must be in [1, ${hashing.NumHashes}]")
    val shardBits = mBits / numShards
    val wps = shardBits / 64 // words per shard
    // shardBits is a multiple of 64, so the in-word bit (p % 64) is the
    // same whether p is read globally or shard-locally.
    val posMasks = hashes
      .select(explode(array((0 until numProbes).map(j =>
        hashing.perm(j, pmod(col(hCol), lit(hashing.P))) % lit(mBits)): _*))
        .as("p"))
      .groupBy((col("p") / lit(shardBits)).cast("int").as("shard"),
        ((col("p") % lit(shardBits)) / lit(64)).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("mask"))
    // Dense per-shard arrays via the same range-join + struct-sort as the
    // 1-row build (see the O(words²) note there).
    hashes.sparkSession.range(numShards.toLong * wps)
      .select((col("id") / lit(wps)).cast("int").as("shard"),
        (col("id") % lit(wps)).cast("int").as("w"))
      .join(posMasks, Seq("shard", "w"), "left")
      .groupBy(col("shard"))
      .agg(collect_list(struct(col("w"),
        coalesce(col("mask"), lit(0L)).as("mask"))).as("wms"))
      .select(col("shard"),
        transform(array_sort(col("wms")), s => s.getField("mask"))
          .as("bits"))
  }

  /** Per-GROUP dense Bloom bitmaps — one independent mBits filter per
    * group value (the data-skipping SIDECAR shape: group = a partition
    * value, hashes = that partition's point-lookup keys, so a literal
    * probe can discard partitions whose filter misses — the Parquet
    * bloom / lakehouse data-skipping idea, with the pass set feeding a
    * broadcast join that triggers dynamic partition pruning instead of
    * any driver-side collect). Same md5-LCG probes and bit_or word
    * packing as the 1-row [[bloomBitmap]]; densified via a
    * groups × word-domain join (the group table is sidecar-scale by
    * contract — one row per partition). */
  def bloomBitmapGrouped(hashes: DataFrame, groupCol: String,
      hCol: String, mBits: Int, numProbes: Int): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0,
      "mBits must be a positive multiple of 64")
    require(numProbes > 0 && numProbes <= hashing.NumHashes,
      s"numProbes must be in [1, ${hashing.NumHashes}]")
    val words = mBits / 64
    val posMasks = hashes
      .select(col(groupCol).as("__g"),
        explode(array((0 until numProbes).map(j =>
          hashing.perm(j, pmod(col(hCol), lit(hashing.P))) % lit(mBits)): _*))
          .as("p"))
      .groupBy(col("__g"), (col("p") / lit(64)).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("mask"))
    hashes.select(col(groupCol).as("__g")).distinct()
      .crossJoin(broadcast(hashes.sparkSession.range(words.toLong)
        .select(col("id").cast("int").as("w"))))
      .join(posMasks, Seq("__g", "w"), "left")
      .groupBy(col("__g"))
      .agg(collect_list(struct(col("w"),
        coalesce(col("mask"), lit(0L)).as("mask"))).as("wms"))
      .select(col("__g").as(groupCol),
        transform(array_sort(col("wms")), s => s.getField("mask"))
          .as("bits"))
  }

  /** AUTO-SIZED per-group Bloom bitmaps — [[bloomBitmapGrouped]] with each
    * group's filter sized from ITS OWN key cardinality instead of one global
    * `mBits`: m_g = ceil(keys_g * bitsPerKey / 64) * 64. A fixed size is the
    * classic scale trap for a data-skipping sidecar — right at the tuning
    * scale, saturated (all partitions pass, zero pruning) at 10× the keys —
    * whereas bits-per-key holds the false-positive rate constant however the
    * corpus grows (12 bits/key ≈ 1% FP at 3 probes, this module's documented
    * sizing contract). The sidecar carries `m` alongside `bits` so probes
    * compute their positions against each group's own modulus; the whole
    * derivation is count arithmetic, so the oracle replays it exactly.
    * Output: (groupCol, m: long, bits: array<long> of length m/64). */
  def bloomBitmapGroupedAuto(hashes: DataFrame, groupCol: String,
      hCol: String, bitsPerKey: Int, numProbes: Int): DataFrame = {
    require(bitsPerKey > 0, "bitsPerKey must be positive")
    require(numProbes > 0 && numProbes <= hashing.NumHashes,
      s"numProbes must be in [1, ${hashing.NumHashes}]")
    val keyed = hashes.select(col(groupCol).as("__g"), col(hCol).as("__h"))
      .distinct()
    // One row per group (sidecar-scale by contract) → broadcast back onto
    // the keys so position math sees each group's modulus.
    val sizes = keyed.groupBy(col("__g"))
      .agg(count(lit(1)).as("__k"))
      .withColumn("m",
        expr(s"((__k * $bitsPerKey + 63) div 64) * 64").cast("long"))
      .drop("__k")
    val posMasks = keyed.join(broadcast(sizes), Seq("__g"))
      .select(col("__g"),
        explode(array((0 until numProbes).map(j =>
          hashing.perm(j, pmod(col("__h"), lit(hashing.P))) % col("m")): _*))
          .as("p"))
      .groupBy(col("__g"), (col("p") / lit(64)).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("mask"))
    // Densify per group over ITS OWN word domain (sequence explode — the
    // range-crossJoin of the fixed-size build can't vary per group).
    sizes
      .select(col("__g"), col("m"),
        explode(sequence(lit(0),
          (col("m") / lit(64)).cast("int") - lit(1))).as("w"))
      .join(posMasks, Seq("__g", "w"), "left")
      .groupBy(col("__g"), col("m"))
      .agg(collect_list(struct(col("w"),
        coalesce(col("mask"), lit(0L)).as("mask"))).as("wms"))
      .select(col("__g").as(groupCol), col("m"),
        transform(array_sort(col("wms")), s => s.getField("mask"))
          .as("bits"))
  }

  /** Sharded twin of [[bloomMightContain]]: each probe position joins only
    * its shard's slice on the `shard` key, so no task ever holds more than
    * one mBits/numShards slice. A hash passes when ALL `numProbes` probe
    * rows find their bit set (the per-h count below — duplicate positions
    * contribute duplicate passing rows, so the count stays exact). Unlike
    * the broadcast variant this pays one exchange of 3·|hashes| probe
    * rows — the documented trade for unbounded eval-set size. */
  def bloomMightContainSharded(bitmaps: DataFrame, hashes: DataFrame,
      hCol: String, mBits: Int, numProbes: Int, numShards: Int): DataFrame = {
    val shardBits = mBits / numShards
    val probeRows = hashes.select(col(hCol)).distinct()
      .select(col(hCol), explode(array((0 until numProbes).map(j =>
        hashing.perm(j, pmod(col(hCol), lit(hashing.P))) % lit(mBits)): _*))
        .as("p"))
      .select(col(hCol),
        (col("p") / lit(shardBits)).cast("int").as("shard"),
        (col("p") % lit(shardBits)).as("lp"))
    val passing = probeRows.join(bitmaps, Seq("shard"))
      .filter(element_at(col("bits"), (col("lp") / lit(64)).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (col("lp") % lit(64)).cast("int"))) =!= lit(0L))
      .groupBy(col(hCol)).agg(count(lit(1)).as("__ok"))
      .filter(col("__ok") === lit(numProbes))
      .select(col(hCol))
    hashes.join(passing, Seq(hCol), "left_semi")
  }

  /** Rebuild scrubbed documents from their kept passages: one row per key
    * group with the surviving passages rejoined in position order. The
    * in-group sort is `array_sort` over collected (pos, passage) structs —
    * collect_list order is partition-dependent, the sort makes the result
    * exact. Documents whose every passage was dropped disappear (their text
    * is fully redundant). */
  def reassembleKept(passages: DataFrame, keyCols: Seq[String],
      out: String = "text"): DataFrame =
    passages.filter(col("kept"))
      .groupBy(keyCols.map(col): _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("passage")))),
          s => s.getField("passage")),
        " ").as(out))
}
