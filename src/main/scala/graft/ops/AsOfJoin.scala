package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (latest-prior) join — the canonical time-series operator Spark has
  * no built-in for (north-star extension; natural companion to the BCRP
  * series data model, SURVEY §1.1). For every left row (key, ts) attach the
  * right row with the greatest rts ≤ ts for that key.
  *
  * Implemented by COMPOSITION, not a custom physical operator (preference
  * (a) in the build guidance): union both sides tagged, then one window
  * pass carrying the last non-null right value forward — a single shuffle
  * on (key), no range join, no per-key loop. This is the plan a hand-built
  * SortMergeAsOfJoin would produce anyway: co-partition by key, co-sort by
  * time, stream.
  *
  * Determinism: right rows must be unique per (key, rts) — pre-aggregate
  * duplicates (the DuckDB ASOF JOIN oracle has the same requirement). Ties
  * rts == ts resolve to "include" (≤ semantics), matching DuckDB.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side; must be unique per (key, rts), and its
    *                   valueCols must be non-null (a null value would be
    *                   skipped by the ignoreNulls carry-forward, yielding an
    *                   older match where SQL ASOF would return the null)
    * @param key        equi key column present on both sides
    * @param lts / rts  event-time columns (same comparable type)
    * @param valueCols  right columns to attach (null when no prior row)
    */
  def lastPrior(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(c => !left.columns.contains(c)),
      "valueCols must not collide with left columns")
    val leftCols = left.columns.toSeq
    val l = valueCols.foldLeft(
      left.withColumn("__t", col(lts)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val r0 = right
      .select(col(key) +: col(rts).as("__t") +: valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    val r = leftCols.filterNot(c => c == key).foldLeft(r0) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val u = l.select((leftCols ++ Seq("__t", "__side") ++ valueCols).map(col): _*)
      .unionByName(
        r.select((leftCols ++ Seq("__t", "__side") ++ valueCols).map(col): _*))
    // Right rows sort before left rows at equal time (side 0 < 1) ⇒ a right
    // row at exactly ts is visible to the left row (≤ semantics).
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__t", "__side")
  }

  /** Nearest-in-time join — for every left row, the right row (same key)
    * minimizing |lts − rts|, ties to the EARLIER right row (the attribution
    * rule: order by (gap, rts)). The event-log companion to [[lastPrior]]:
    * prior-only attribution misses a purchase seconds AFTER the click.
    *
    * Composition, not a range join: one [[lastPrior]] pass attaches the
    * greatest rts ≤ lts, a second pass on NEGATED timestamps attaches the
    * smallest rts ≥ lts (the same ≤-with-ties window run on the mirrored
    * axis), and a row-local comparison picks the smaller gap — two key
    * shuffles total, each the sorted-stream plan, no per-key loop, no
    * inequality join. Equidistant candidates resolve to prior (the smaller
    * rts), exactly the (gap, rts) order. Left rows with no right row at
    * all keep null match columns; same right-side uniqueness/non-null
    * contract as [[lastPrior]].
    *
    * Returns left columns + `matched_ts` (the chosen rts) + `gap`
    * (|lts − rts|, null when unmatched) + valueCols. */
  def nearest(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, valueCols: Seq[String]): DataFrame = {
    val pVals = valueCols.map(c => s"__p_$c")
    val nVals = valueCols.map(c => s"__n_$c")
    val rp = valueCols.zip(pVals).foldLeft(
      right.withColumn("__pt", col(rts))) { case (df, (c, p)) =>
        df.withColumnRenamed(c, p)
      }
    val withPrior = lastPrior(left, rp, key, lts, rts, "__pt" +: pVals)
    val ln = withPrior.withColumn("__negl", negate(col(lts)))
    val rn = valueCols.zip(nVals).foldLeft(
      right.withColumn("__nt", col(rts))
        .withColumn("__negr", negate(col(rts)))) { case (df, (c, n)) =>
        df.withColumnRenamed(c, n)
      }
    val both = lastPrior(ln, rn, key, "__negl", "__negr", "__nt" +: nVals)
    val usePrior = col("__pt").isNotNull &&
      (col("__nt").isNull ||
        (col(lts) - col("__pt")) <= (col("__nt") - col(lts)))
    val matched = both
      .withColumn("matched_ts",
        when(usePrior, col("__pt")).otherwise(col("__nt")))
      .withColumn("gap",
        when(usePrior, col(lts) - col("__pt"))
          .otherwise(col("__nt") - col(lts)))
    val out = valueCols.zip(pVals.zip(nVals)).foldLeft(matched) {
      case (df, (c, (p, n))) =>
        df.withColumn(c, when(usePrior, col(p)).otherwise(col(n)))
    }
    out.select(left.columns.map(col) ++
      Seq(col("matched_ts"), col("gap")) ++ valueCols.map(col): _*)
  }

  /** Interval (band) join: all (left, right) pairs with the same `key` and
    * |lts − rts| ≤ tolerance. A naive inequality join degenerates to a
    * per-key nested loop; instead each side lands in coarse time buckets of
    * width `tolerance` — a right row can only match left rows in its own or
    * an adjacent bucket, so the candidate set is an EQUI join on
    * (key, bucket) with the exact band refined afterwards. Each right row
    * is replicated 3× (constant factor) and every true pair is found
    * exactly once (the right row's three candidate buckets are distinct and
    * the left row has one bucket).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    require(left.columns.intersect(right.columns).toSeq == Seq(key),
      s"left/right may only share the key column '$key'")
    // Integer `div`, not floor(x / tol): nano timestamps exceed 2^53, where
    // double division would bucket some rows off by one.
    val l = left.withColumn("__lb", expr(s"`$lts` div ${tolerance}L"))
    val r = right
      .withColumnRenamed(key, "__rkey")
      .withColumn("__rb0", expr(s"`$rts` div ${tolerance}L"))
      .withColumn("__rb",
        explode(array(col("__rb0") - 1, col("__rb0"), col("__rb0") + 1)))
      .drop("__rb0")
    l.join(r, col(key) === col("__rkey") && col("__lb") === col("__rb"))
      .filter(abs(col(lts) - col(rts)) <= tolerance)
      .drop("__lb", "__rb", "__rkey")
  }

  /** Interval-OVERLAP join — the range join over two INTERVAL sets with
    * NO equi key ([[intervalJoin]] handles keyed point-in-band): all
    * (left, right) pairs with `ls ≤ re AND rs ≤ le`. A direct inequality
    * join is a cartesian; instead both sides explode into fixed
    * `bucketNs`-wide time buckets covering their span, candidates form an
    * EQUI join on the bucket id, and the exact overlap refines after.
    * Overlapping pairs share every bucket of their intersection, so each
    * pair is emitted ONCE by the canonical-bucket rule: keep it only in
    * the FIRST shared bucket, max(first(l), first(r)) — no distinct, no
    * second shuffle. Replication is span/bucketNs per row (size the
    * bucket near the typical interval length); at scale this is the
    * standard overlap-join shape — a shuffle on the bucket id, never an
    * all-pairs comparison. Columns must be disjoint across sides. */
  def overlapJoin(left: DataFrame, right: DataFrame, ls: String,
      le: String, rs: String, re: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucket width must be positive")
    require(left.columns.intersect(right.columns).isEmpty,
      "left/right column names must be disjoint")
    // integer `div`, not floor(x / width): see intervalJoin
    val l = left.withColumn("__bkt",
      explode(sequence(expr(s"`$ls` div ${bucketNs}L"),
        expr(s"`$le` div ${bucketNs}L"))))
    val r = right.withColumn("__rbkt",
      explode(sequence(expr(s"`$rs` div ${bucketNs}L"),
        expr(s"`$re` div ${bucketNs}L"))))
    l.join(r, col("__bkt") === col("__rbkt"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le) &&
        col("__bkt") === greatest(expr(s"`$ls` div ${bucketNs}L"),
          expr(s"`$rs` div ${bucketNs}L")))
      .drop("__bkt", "__rbkt")
  }
}
