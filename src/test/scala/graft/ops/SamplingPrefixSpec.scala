package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.hashing

/** Bit-equality of the two-phase bucket-prefix plans (perGroupTokenBudget /
  * perGroupCap / packSequences) against the single total-order-window
  * reference implementations they replaced — across budget boundaries,
  * zero-weight rows, skewed group sizes, near-2^40 token counts, empty
  * inputs, and both tiny (boundary-heavy) and production bucket counts.
  * Long addition is associative/commutative and bucketing refines the same
  * (coin, id) order, so the match must be EXACT, not approximate. */
class SamplingPrefixSpec extends SparkSpec {

  import spark.implicits._

  private def coin(c: Column): Column = hashing.h64(c.cast("string"))

  // The pre-rewrite implementations, kept verbatim as the semantic spec.
  private def refBudget(df: DataFrame, g: String, id: String, tok: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col(g)).orderBy(coin(col(id)), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tok)).over(w))
      .filter(col("__cum") <= budget).drop("__cum")
  }

  private def refCap(df: DataFrame, g: String, id: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(g)).orderBy(coin(col(id)), col(id))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  private def refPack(df: DataFrame, g: String, id: String, tok: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col(g)).orderBy(coin(col(id)), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tok)).over(w))
      .withColumn("seq_first", expr(s"(__cum - $tok) div $budget"))
      .withColumn("seq_last",
        greatest(col("seq_first"), expr(s"(__cum - 1) div $budget")))
      .withColumn("spans", col("seq_last") - col("seq_first") + lit(1))
      .drop("__cum")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  /** Skewed corpus: one fat group (with zero-token rows sprinkled in), one
    * mid group, two singletons, plus an all-zero-tokens group. */
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(42)
    val fat = Seq.tabulate(500)(i =>
      (i.toLong, "fat", if (i % 11 == 0) 0L else rng.nextInt(40).toLong))
    val mid = Seq.tabulate(60)(i => (1000L + i, "mid", rng.nextInt(25).toLong))
    val ones = Seq((2000L, "one", 7L), (2001L, "uno", 0L))
    val zeros = Seq.tabulate(10)(i => (3000L + i, "zero", 0L))
    (fat ++ mid ++ ones ++ zeros).toDF("doc_id", "grp", "ntok")
  }

  private lazy val fatTotal: Long = corpus.filter($"grp" === "fat")
    .agg(sum($"ntok")).as[Long].head()

  test("perGroupTokenBudget ≡ total-order window across budget sweep " +
    "and bucket counts") {
    val budgets = Seq(1L, 9L, 57L, 321L, 2048L, fatTotal - 1, fatTotal,
      fatTotal + 1, Long.MaxValue / 4)
    for (b <- budgets; buckets <- Seq(8, 4096)) {
      val got = rows(Sampling.perGroupTokenBudget(
        corpus, "grp", "doc_id", "ntok", b, buckets))
      val want = rows(refBudget(corpus, "grp", "doc_id", "ntok", b))
      assert(got == want, s"budget=$b buckets=$buckets: " +
        s"${(got diff want).size} extra, ${(want diff got).size} missing")
    }
  }

  test("perGroupCap ≡ total-order row_number window") {
    for (k <- Seq(1, 5, 59, 61, 1000); buckets <- Seq(8, 4096)) {
      val got = rows(Sampling.perGroupCap(corpus, "grp", "doc_id", k, buckets))
      val want = rows(refCap(corpus, "grp", "doc_id", k))
      assert(got == want, s"k=$k buckets=$buckets")
    }
  }

  test("packSequences ≡ total-order window (layout columns bit-equal)") {
    for (b <- Seq(1L, 16L, 127L, 4096L); buckets <- Seq(8, 4096)) {
      val got = rows(Sampling.packSequences(
        corpus, "grp", "doc_id", "ntok", b, buckets))
      val want = rows(refPack(corpus, "grp", "doc_id", "ntok", b))
      assert(got == want, s"budget=$b buckets=$buckets")
    }
  }

  test("token counts near 2^40 stay exact (no double rounding anywhere)") {
    val big = Seq.tabulate(64)(i =>
      (i.toLong, s"g${i % 3}", (1L << 40) + i * 7919L))
      .toDF("doc_id", "grp", "ntok")
    for (b <- Seq(1L << 41, (1L << 43) + 13L)) {
      assert(rows(Sampling.perGroupTokenBudget(big, "grp", "doc_id", "ntok",
        b, 8)) == rows(refBudget(big, "grp", "doc_id", "ntok", b)))
      assert(rows(Sampling.packSequences(big, "grp", "doc_id", "ntok",
        b, 8)) == rows(refPack(big, "grp", "doc_id", "ntok", b)))
    }
  }

  test("empty input and all-rows-overflow degenerate cleanly") {
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "grp", "ntok")
    assert(Sampling.perGroupTokenBudget(
      empty, "grp", "doc_id", "ntok", 10L).count() == 0)
    assert(Sampling.packSequences(
      empty, "grp", "doc_id", "ntok", 10L).count() == 0)
    // every row alone exceeds the budget -> only zero-token rows at the
    // group head can survive (cum stays 0 <= budget); match the window spec
    val heavy = Seq((1L, "g", 50L), (2L, "g", 60L), (3L, "g", 0L))
      .toDF("doc_id", "grp", "ntok")
    assert(rows(Sampling.perGroupTokenBudget(heavy, "grp", "doc_id", "ntok",
      10L, 8)) == rows(refBudget(heavy, "grp", "doc_id", "ntok", 10L)))
  }

  test("zero-token doc pins to its stream slot (the div-vs-floor fix)") {
    // a zero-token doc whose cumulative position is 0: __cum - 1 = -1,
    // where Spark div truncates to 0 but DuckDB // floors to -1; the
    // greatest() clamp pins seq_last to seq_first on both engines
    val docs = Seq((1L, "s", 0L), (2L, "s", 5L), (3L, "s", 9L))
      .toDF("doc_id", "grp", "ntok")
    val out = Sampling.packSequences(docs, "grp", "doc_id", "ntok", 4L, 8)
      .select("doc_id", "seq_first", "seq_last", "spans").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("seq_last") >= r.getAs[Long]("seq_first"))
      assert(r.getAs[Long]("spans") ==
        r.getAs[Long]("seq_last") - r.getAs[Long]("seq_first") + 1)
      assert(r.getAs[Long]("seq_first") >= 0L)
    }
    val zero = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(zero.getAs[Long]("spans") == 1L, "zero-token doc spans exactly 1")
  }

  test("NULL group keys survive the prefix join-back (window parity)") {
    // Window.partitionBy keeps NULL as its own partition; the bucket-prefix
    // join-back must use <=> to do the same (=== would drop these rows).
    val withNulls = Seq(
      (1L, null, 5L), (2L, null, 7L), (3L, null, 0L), (4L, null, 11L),
      (5L, "g", 3L), (6L, "g", 9L))
      .toDF("doc_id", "grp", "ntok")
    for (b <- Seq(1L, 12L, 100L)) {
      assert(rows(Sampling.perGroupTokenBudget(withNulls, "grp", "doc_id",
        "ntok", b, 8)) == rows(refBudget(withNulls, "grp", "doc_id", "ntok", b)))
      assert(rows(Sampling.packSequences(withNulls, "grp", "doc_id",
        "ntok", b, 8)) == rows(refPack(withNulls, "grp", "doc_id", "ntok", b)))
    }
    assert(rows(Sampling.perGroupCap(withNulls, "grp", "doc_id", 2, 8)) ==
      rows(refCap(withNulls, "grp", "doc_id", 2)))
  }

  test("result is independent of input partitioning") {
    def got(df: DataFrame) = rows(Sampling.perGroupTokenBudget(
      df, "grp", "doc_id", "ntok", 321L, 8))
    assert(got(corpus.repartition(1)) == got(corpus.repartition(13)))
  }
}
