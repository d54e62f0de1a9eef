package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a 100 TB
  * pipeline runs before publishing a table (the Deequ/expectations idea,
  * Spark-first): every check compiles to aggregate expressions over ONE
  * pass of the data (a single `agg` — no per-check scans), and the
  * result is a small (check, observed, threshold, passed) table a CI
  * gate can assert on. Completeness/range/set checks are plain
  * conditional counts (map-side combined); uniqueness is the one check
  * that needs a distinct (Spark plans the mixed aggregate with one
  * Expand — still a single source scan). */
object Expectations {

  /** One expectation: `name`, the aggregate producing the observed
    * fraction/value, and the minimum the observation must reach. */
  final case class Check(name: String, observed: Column, minimum: Double)

  /** Fraction of rows where `c` is not null. */
  def complete(name: String, c: Column): Check =
    Check(name, sum(when(c.isNotNull, 1L).otherwise(0L)) / count(lit(1)),
      1.0)

  /** Fraction of rows inside [lo, hi] (nulls count as violations). */
  def inRange(name: String, c: Column, lo: Double, hi: Double,
      minimum: Double = 1.0): Check =
    Check(name,
      sum(when(c.isNotNull && c >= lo && c <= hi, 1L).otherwise(0L)) /
        count(lit(1)), minimum)

  /** Fraction of rows whose value is one of `allowed`. */
  def inSet(name: String, c: Column, allowed: Seq[String],
      minimum: Double = 1.0): Check =
    Check(name,
      sum(when(c.isInCollection(allowed), 1L).otherwise(0L)) /
        count(lit(1)), minimum)

  /** Distinct key combinations divided by row count — 1.0 iff the key is
    * unique. */
  def unique(name: String, cols: Seq[Column]): Check =
    Check(name, countDistinct(cols.head, cols.tail: _*) / count(lit(1)),
      1.0)

  /** Associative (streamable/shardable) form of a conditional-count
    * check: the predicate's satisfied-count and the slice row count are
    * sufficient statistics that SUM across slices or micro-batches —
    * unlike [[Check]]'s opaque aggregate, which only evaluates over one
    * frame. Covers completeness/range/domain; uniqueness instead travels
    * as per-slice-distinct key tuples (see [[validateFromPartials]]). */
  final case class CondCheck(name: String, pred: Column, minimum: Double)

  /** ONE partial row per input slice: total rows plus each check's
    * satisfied-count — the map-side-combined sufficient statistics
    * [[validateFromPartials]] sums back together. */
  def condPartials(df: DataFrame, checks: Seq[CondCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.map(c => sum(when(c.pred, 1L).otherwise(0L)).as(c.name))
    df.agg(count(lit(1)).as("__n"), aggs: _*)
  }

  /** Rebuild [[validate]]'s (check, observed, threshold, passed) verdict
    * from appended [[condPartials]] rows plus the appended per-slice-
    * distinct `uniqueKeys` tuples. Exactly equals `validate` over the
    * union of the slices: conditional counts sum, and the distinct of
    * unioned per-slice distincts is the distinct of the union. The only
    * non-1-row input is `uniqueKeys` — that IS exact uniqueness's
    * inherent cost (same shuffle mass as the batch distinct); both
    * 1-row aggregates meet in a broadcast-trivial cross join. */
  def validateFromPartials(partials: DataFrame, checks: Seq[CondCheck],
      uniqueName: String, uniqueKeys: DataFrame,
      uniqueMinimum: Double = 1.0): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val merged = partials.agg(sum(col("__n")).as("__n"),
      checks.map(c => sum(col(c.name)).as(c.name)): _*)
    // null-key tuples drop BEFORE the distinct so the count matches
    // [[unique]]'s countDistinct exactly (SQL COUNT(DISTINCT a, b)
    // ignores rows with any null argument)
    val uniq = uniqueKeys.na.drop("any").distinct()
      .agg(count(lit(1)).as(uniqueName))
    val one = merged.crossJoin(uniq)
    val stacked =
      (checks.map(c => (c.name, c.minimum)) :+
        ((uniqueName, uniqueMinimum))).map { case (n, m) =>
        struct(lit(n).as("check"),
          round(col(n).cast("double") / col("__n"), 6).as("observed"),
          lit(m).as("threshold"))
      }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check"), col("r.observed"), col("r.threshold"),
        (col("r.observed") >= col("r.threshold")).as("passed"))
  }

  /** Run all checks in ONE aggregation pass; returns
    * (check, observed, threshold, passed) rows in check order. Observed
    * values round to 6 decimals so the verdict is engine- and
    * partition-independent. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.map(c => round(c.observed, 6).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { c =>
      struct(lit(c.name).as("check"), col(c.name).as("observed"),
        lit(c.minimum).as("threshold"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check"), col("r.observed"), col("r.threshold"),
        (col("r.observed") >= col("r.threshold")).as("passed"))
  }
}
