package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.hashing

/** Deterministic sampling / data-mixing operators for training-data
  * pipelines (north-star extension). `rand()`-based sampling is useless in
  * a reproducible corpus build — retries, re-runs, and engines must agree
  * on the sample — so every operator here derives its "randomness" from
  * the shared md5 hash of a row id: reproducible, partition-independent,
  * and replayable by the DuckDB oracle bit-for-bit.
  *
  * Scale design. The Bernoulli samplers are single codegen'd filters — no
  * shuffle at all. The ORDER-dependent primitives (token budget, per-group
  * cap, sequence packing) used to be one total-order window per group,
  * which serializes each group into a single task — unusable when a
  * language group holds terabytes. They now run a two-phase bucket-prefix
  * plan over the hash order:
  *
  *  1. bucket every row by the top bits of its 60-bit coin (buckets are
  *     contiguous, ordered ranges of the walk order — a coin tie can never
  *     straddle a bucket);
  *  2. aggregate the per-(group, bucket) weight sums (map-side combine,
  *     ≤ groups×buckets tiny rows), window the per-group running prefix on
  *     that aggregate, and broadcast it back;
  *  3. decide each bucket wholesale from the broadcast: prefix-through
  *     ≤ limit ⇒ keep all (a map-only filter, no sort, no shuffle);
  *     prefix-before > limit ⇒ drop all; only the single boundary bucket
  *     per group (~1/buckets of the data) is fine-sorted to place the
  *     cut-off row exactly.
  *
  * The result is bit-identical to the total-order window (long addition is
  * associative/commutative, and bucketing refines the same (coin, id)
  * order) but the biggest sort is a 1/4096 slice, and the keep/drop bulk
  * never shuffles. Preconditions: weights (token counts) must be ≥ 0 —
  * they are counts — and the group column must be low-cardinality enough
  * that groups×buckets prefix rows broadcast (languages/sources: ≤ a few
  * thousand groups; same bound as the unigram-LM vocab broadcast).
  */
object Sampling {

  /** Hash-range buckets for the two-phase prefix plans. 4096 means the
    * boundary fine-sort touches ~0.02 % of rows while the per-group prefix
    * table stays broadcastable (groups × 4096 longs). */
  val PrefixBuckets: Int = 4096

  /** Hash of the id column used as the sampling coin: uniform on [0, 2^60). */
  private def coin(idCol: Column): Column = hashing.h64(idCol.cast("string"))

  /** Bucket = top log2(buckets) bits of the 60-bit coin: monotone in the
    * coin, so buckets are contiguous ranges of the (coin, id) walk order. */
  private def bucketOf(c: Column, buckets: Int): Column = {
    val shift = 60 - Integer.numberOfTrailingZeros(buckets)
    shiftright(c, shift)
  }

  private def requirePow2(buckets: Int): Unit =
    require(buckets >= 2 && Integer.bitCount(buckets) == 1 && buckets <= (1 << 20),
      s"buckets must be a power of two in [2, 2^20], got $buckets")

  /** Deterministic Bernoulli sample: keeps rows whose hash bucket (of
    * 10 000) falls below `rate`·10 000. Exactly reproducible across runs,
    * partitionings, and engines; disjoint bucket ranges give disjoint
    * samples (e.g. train [0, 9000) vs held-out [9000, 10000)). */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    // round, don't truncate: 0.3 * 10000 is 2999.999… in binary floating
    // point, and a floored threshold would silently shift the split bucket
    df.filter(coin(col(idCol)) % 10000 < math.round(rate * 10000))
  }

  /** Shared two-phase prefix-limit kernel: keep each group's prefix of the
    * (coin, id) walk while the running `weight` total stays ≤ `limit`.
    * Weight lit(1) ⇒ per-group cap; weight = token count ⇒ token budget.
    * See the object doc for the plan shape. Weights must be ≥ 0 (the
    * bucket-wholesale decisions rely on the running sum being monotone). */
  private def prefixLimit(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, limit: Long, buckets: Int): DataFrame = {
    requirePow2(buckets)
    val outCols = df.columns.map(col)
    val c = coin(col(idCol))
    val withB = df.withColumn("__w", weight)
      .withColumn("__bkt", bucketOf(coin(col(idCol)), buckets))
    // Phase 1: tiny per-(group, bucket) weight sums — map-side combined.
    val sums = withB
      .groupBy(col(groupCol).as("__g"), col("__bkt").as("__b"))
      .agg(sum(col("__w")).as("__s"))
    // Phase 2: per-group running prefix over ≤ `buckets` aggregate rows.
    val wPref = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val states = sums
      .withColumn("__before", coalesce(sum(col("__s")).over(wPref), lit(0L)))
      .withColumn("__through", col("__before") + col("__s"))
      .select(col("__g"), col("__b"), col("__before"), col("__through"))
    // <=> on the group key: groupBy keeps NULL as its own group, so the
    // join-back must too (=== would silently drop NULL-group rows, which
    // the window plan this replaces kept).
    val joined = withB.join(broadcast(states),
      col(groupCol) <=> col("__g") && col("__bkt") === col("__b"))
    // Phase 3a: whole buckets inside the limit — map-only, no sort/shuffle.
    val keepAll = joined.filter(col("__through") <= limit)
    // Phase 3b: the one boundary bucket per group gets the fine sort;
    // buckets entirely past the limit (__before > limit) never shuffle.
    val boundary = joined
      .filter(col("__before") <= limit && col("__through") > limit)
    val wFine = Window.partitionBy(col(groupCol)).orderBy(c, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fineKept = boundary
      .withColumn("__cum", col("__before") + sum(col("__w")).over(wFine))
      .filter(col("__cum") <= limit)
    keepAll.select(outCols: _*).unionAll(fineKept.select(outCols: _*))
  }

  /** Per-group TOKEN budget — the corpus-sizing primitive: walk each
    * group's rows in deterministic hash order and keep rows while the
    * running token total stays within `budget` (the first row that would
    * overflow is excluded, as are all after it — a fixed prefix of the
    * hash order, so the selection is exactly reproducible). Two-phase
    * bucket-prefix plan; token counts must be ≥ 0. */
  def perGroupTokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long,
      buckets: Int = PrefixBuckets): DataFrame = {
    require(budget > 0, "budget must be positive")
    prefixLimit(df, groupCol, idCol, col(tokenCol), budget, buckets)
  }

  /** Per-group cap — the data-mixing primitive: at most `k` rows per group,
    * chosen by hash order (a deterministic "random k") with the id as the
    * final tie-break; groups under the cap pass through whole. A running
    * COUNT is a running sum of 1s, so this is the same two-phase
    * bucket-prefix kernel as the token budget — no per-group total-order
    * row_number window. */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
      k: Int, buckets: Int = PrefixBuckets): DataFrame = {
    require(k > 0, "cap must be positive")
    prefixLimit(df, groupCol, idCol, lit(1L), k.toLong, buckets)
  }

  /** Stratified deterministic sample — the mixing-weights primitive: each
    * group keeps its own Bernoulli rate (e.g. upsample scarce languages,
    * downsample boilerplate-heavy sources). Thresholds are resolved to
    * integer bucket bounds at PLAN time (`math.round(rate·10000)`), so the
    * runtime filter is pure integer arithmetic on the shared hash coin —
    * reproducible across runs, partitionings, and engines, and nested
    * samples (same coin, lower rate) are strict subsets. Groups not in
    * `rates` use `defaultRate`. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val threshold = rates.foldLeft(
      lit(math.round(defaultRate * 10000)): Column) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(math.round(r * 10000))).otherwise(acc)
    }
    df.filter(coin(col(idCol)) % 10000 < threshold)
  }

  /** Temperature-based mixing sample (mT5-style α-sampling): group g with
    * n_g rows keeps rate min(1, targetFrac·N·w_g / (Σw · n_g)) where
    * w_g = n_g^α — α < 1 upsamples scarce groups relative to their share,
    * α = 1 is proportional, α > 1 concentrates on the head. Unlike
    * [[stratifiedSample]], the rates are DATA-dependent: they are computed
    * IN-PLAN from a tiny per-group aggregate (groups-cardinality rows,
    * broadcast back), so there is no collect and no second job.
    *
    * Determinism/oracle contract: the weight uses exact column forms where
    * they exist (α = 0.5 ⇒ `sqrt`, IEEE-correctly-rounded on both engines;
    * α = 1 ⇒ identity; α = 2 ⇒ n·n), rounded to 9 decimals so the
    * DECIMAL(38,12) weight-sum cast is exact (no engine rounding-mode
    * exposure) and partition-order independent; the per-group rate is
    * rounded to 9 decimals and floored onto a 2^20 integer coin threshold,
    * and the coin is the shared md5 hash — the oracle replays the exact
    * sample. General α falls back to `pow` (libm last-ulp divergence
    * possible in principle; the round-9 absorbs it away from boundaries).
    * NULL group keys keep their own rate (null-safe join). Note the budget
    * is approximate when α < 1 and rates cap at 1.0: a capped tail group
    * can't absorb its reshaped share, so total kept may undershoot
    * targetFrac·N (spec-locked). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      targetFrac: Double, alpha: Double): DataFrame = {
    require(targetFrac >= 0 && targetFrac <= 1, "targetFrac must be in [0, 1]")
    require(alpha > 0, "alpha must be positive")
    val weight: Column => Column = alpha match {
      case 0.5 => sqrt(_)
      case 1.0 => identity
      case 2.0 => n => n * n
      case a => pow(_, lit(a))
    }
    val counts = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(weight(col("__n").cast("double")), 9))
    val totals = counts.agg(
      sum(col("__w").cast("decimal(38,12)")).cast("double").as("__sw"),
      sum(col("__n")).cast("double").as("__tot"))
    val thresholds = counts.crossJoin(broadcast(totals))
      .withColumn("__rate", round(least(lit(1.0),
        lit(targetFrac) * col("__tot") * col("__w") /
          (col("__sw") * col("__n").cast("double"))), 9))
      .select(col("__g"),
        floor(col("__rate") * (1L << 20)).cast("long").as("__thr"))
    df.join(broadcast(thresholds), col(groupCol) <=> col("__g"))
      .filter(coin(col(idCol)) % (1L << 20) < col("__thr"))
      .drop("__g", "__thr")
  }

  /** Sequence packing — the batch-assembly primitive: per `partCol` stream,
    * documents are laid end-to-end in deterministic hash order and chunked
    * into fixed `budget`-token training sequences (documents straddle a
    * boundary rather than leaving slack — the standard concat-and-chunk
    * packing). Adds `seq_first`/`seq_last` (0-based sequence ids covering
    * the doc) and `spans` (how many sequences it crosses).
    *
    * Every row needs its global running position, so the fine cumulative
    * sum cannot be restricted to a boundary bucket — instead it is
    * partitioned by (stream, bucket) with the broadcast bucket prefix added
    * back, which cuts the biggest sort from "one task per stream" to
    * 1/`buckets` of a stream while producing bit-identical positions (long
    * addition is associative; buckets refine the same (coin, id) order).
    * Token counts must be ≥ 0; a zero-token document occupies no tokens and
    * is pinned to the sequence at its stream position (`seq_last` clamps to
    * `seq_first`, `spans` = 1). */
  def packSequences(df: DataFrame, partCol: String, idCol: String,
      tokenCol: String, budget: Long,
      buckets: Int = PrefixBuckets): DataFrame = {
    require(budget > 0, "budget must be positive")
    requirePow2(buckets)
    val c = coin(col(idCol))
    val withB = df.withColumn("__bkt", bucketOf(c, buckets))
    val sums = withB
      .groupBy(col(partCol).as("__g"), col("__bkt").as("__b"))
      .agg(sum(col(tokenCol)).as("__s"))
    val wPref = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val states = sums
      .withColumn("__before", coalesce(sum(col("__s")).over(wPref), lit(0L)))
      .select(col("__g"), col("__b"), col("__before"))
    val joined = withB.join(broadcast(states),
      col(partCol) <=> col("__g") && col("__bkt") === col("__b"))
    val wFine = Window.partitionBy(col(partCol), col("__bkt"))
      .orderBy(c, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("__cum", col("__before") + sum(col(tokenCol)).over(wFine))
      .withColumn("seq_first",
        expr(s"(__cum - $tokenCol) div $budget"))
      // clamp: a zero-token doc has __cum - 1 one position BEFORE its own
      // slot (possibly -1, where Spark `div` truncates toward zero while
      // the DuckDB oracle's `//` floors — a silent cross-engine split);
      // greatest() pins it to seq_first on both engines.
      .withColumn("seq_last",
        greatest(col("seq_first"), expr(s"(__cum - 1) div $budget")))
      .withColumn("spans", col("seq_last") - col("seq_first") + lit(1))
      .drop("__cum", "__bkt", "__g", "__b", "__before")
  }
}
