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
  * Scale design: both operators are a single codegen'd filter or one
  * windowed rank per group — no extra shuffle beyond the per-group
  * partitioning the semantics require, no driver-side state.
  */
object Sampling {

  /** Hash of the id column used as the sampling coin: uniform on [0, 2^60). */
  private def coin(idCol: Column): Column = hashing.h64(idCol.cast("string"))

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

  /** Per-group TOKEN budget — the corpus-sizing primitive: walk each
    * group's rows in deterministic hash order and keep rows while the
    * running token total stays within `budget` (the first row that would
    * overflow is excluded, as are all after it — a fixed prefix of the
    * hash order, so the selection is exactly reproducible). One windowed
    * cumulative sum per group. */
  def perGroupTokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(coin(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Per-group cap — the data-mixing primitive: at most `k` rows per group,
    * chosen by hash order (a deterministic "random k") with the id as the
    * final tie-break. One window rank per group; groups under the cap pass
    * through whole. */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(coin(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
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

  /** Sequence packing — the batch-assembly primitive: per `partCol` stream,
    * documents are laid end-to-end in deterministic hash order and chunked
    * into fixed `budget`-token training sequences (documents straddle a
    * boundary rather than leaving slack — the standard concat-and-chunk
    * packing). Adds `seq_first`/`seq_last` (0-based sequence ids covering
    * the doc) and `spans` (how many sequences it crosses). Everything is
    * integer arithmetic on one windowed cumulative sum per stream, so runs,
    * retries and engines agree exactly.
    */
  def packSequences(df: DataFrame, partCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(partCol))
      .orderBy(coin(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("seq_first",
        expr(s"(__cum - $tokenCol) div $budget"))
      .withColumn("seq_last", expr(s"(__cum - 1) div $budget"))
      .withColumn("spans", col("seq_last") - col("seq_first") + lit(1))
      .drop("__cum")
  }
}
