package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.hashing

/** Bounded-size frequency sketches — the 100 TB substitute for exact
  * per-key counting when the key domain (tokens, URLs, user ids) is too
  * large to shuffle and hold: a count-min sketch (Cormode & Muthukrishnan
  * 2005) folds any number of keys into a fixed `depth × width` counter
  * grid, merges associatively (partial aggregation stays map-side), and
  * answers point queries with an upper-bound estimate
  * (`est ≥ true`, overshoot bounded by `e·N/width` with probability
  * `1 − e^−depth`).
  *
  * Determinism contract (CLAUDE.md): every row hash derives from the
  * shared md5 base hash with a `cms<d>|` seed prefix, so the DuckDB
  * oracle replays the sketch — build, collisions, and estimates —
  * bit-for-bit. Production swaps [[hashing.h64]] for [[hashing.xxh60]]
  * exactly like d8 does for MinHash.
  */
object Sketches {

  /** Row `d`'s bucket for a key column: shared md5 hash of the
    * seed-prefixed key, modulo `width`. */
  def cmsBucket(d: Int, key: Column, width: Int): Column =
    hashing.h64(concat(lit(s"cms$d|"), key)) % lit(width.toLong)

  /** DuckDB twin of [[cmsBucket]] over a key expression. */
  def sqlCmsBucket(d: Int, e: String, width: Int): String =
    s"(${hashing.sqlH64(s"'cms$d|' || $e")} % $width)"

  /** Build a count-min sketch over a key column: one row per touched
    * (d, bucket) cell — at most `depth × width` rows however many input
    * rows arrive. Single pass: each occurrence explodes to its `depth`
    * cells row-locally, then ONE keyed aggregation with map-side combine;
    * an untouched cell is count 0 by omission. Sketches over disjoint
    * corpus slices union-and-re-aggregate into the sketch of the union —
    * the associativity that makes this a streaming/distributed-native
    * counter. */
  def countMin(keys: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val cells = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmsBucket(d, col(keyCol), width).as("bucket")))
    keys.select(explode(array(cells: _*)).as("__c"))
      .groupBy(col("__c.d").as("d"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate probe keys against a [[countMin]] sketch: the classic
    * min over the key's `depth` cells. The sketch is bounded
    * (`≤ depth × width` rows) and broadcast, so probing any number of
    * keys is a map-side join — no shuffle of the probe stream. Returns
    * the probe rows plus `cms_est` (`≥` the key's true count whenever the
    * sketch saw the same stream). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val keep = probes.columns.map(col)
    val cells = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmsBucket(d, col(keyCol), width).as("bucket")))
    probes.select(keep :+ explode(array(cells: _*)).as("__c"): _*)
      .join(broadcast(sketch),
        col("__c.d") === col("d") && col("__c.bucket") === col("bucket"))
      .groupBy(keep.toSeq: _*)
      .agg(min(col("c")).as("cms_est"))
  }

  /** Equi-width histogram — the numeric-profiling sketch (≤ `bins` rows
    * whatever the input): per-bin row count + exact DECIMAL value mass
    * over `bins` equal-width cells of `[lo, hi]`. Bounds come from the
    * data (a 1-row min/max aggregate broadcast back — no driver collect)
    * unless `bounds` pins them; with pinned bounds, histograms of
    * disjoint slices union-and-re-aggregate into the union's histogram
    * (counts and DECIMAL masses both add), the same associativity that
    * makes [[countMin]] distributed-native. Values outside pinned bounds
    * clamp into the edge bins (`v = hi` lands in the last by the same
    * clamp); the bin index
    * is `floor((v − lo) · bins / (hi − lo))` in IEEE double arithmetic —
    * exactly reproducible by any engine evaluating the same expression,
    * which is what lets the DuckDB oracle hash-match bin populations.
    * Output: (bin, lo_edge, hi_edge, n, mass) — edges rounded to 4 for
    * display only. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, bins: Int,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = col(valueCol).cast("double")
    val mm = bounds match {
      case Some((lo, hi)) =>
        df.sparkSession.range(1)
          .select(lit(lo).as("__lo"), lit(hi).as("__hi"))
      case None =>
        df.agg(min(v).as("__lo"), max(v).as("__hi"))
    }
    val w = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    df.select(v.as("__v")).filter(col("__v").isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(bins - 1L), greatest(lit(0L),
            floor((col("__v") - col("__lo")) * lit(bins.toDouble) /
              (col("__hi") - col("__lo")))))))
      .groupBy(col("bin"), col("__lo"), col("__hi"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(18,2)")).cast("double").as("mass"))
      .select(col("bin"),
        round(col("__lo") + col("bin").cast("double") * w, 4).as("lo_edge"),
        round(col("__lo") + (col("bin") + lit(1L)).cast("double") * w, 4)
          .as("hi_edge"),
        col("n"), col("mass"))
  }

  /** Quantile estimates read off an [[equiWidthHistogram]] — the sketch's
    * classic consumer (optimizer statistics, range-partition boundary
    * picks): for each requested fraction `q`, find the first bin whose
    * cumulative count reaches `q·N` and interpolate linearly inside it.
    * Everything downstream of the histogram is bounded by the bin count —
    * the cumulative window and the per-q argmin run over ≤ `bins` rows,
    * so probing any number of quantiles never rescans the data. Returns
    * (q, est) with `est` rounded to 4; the same IEEE expression evaluated
    * by any engine yields the same bits. */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "fractions must be in (0, 1]")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val cum = hist // bounded: ≤ bins rows, so the global window is fine
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("cumb", col("cum") - col("n"))
    val tot = hist.agg(sum(col("n")).as("total"))
    qs.toDF("q")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(cum))
      .filter(col("cum") >= col("q") * col("total"))
      .groupBy(col("q"), col("total"))
      .agg(min(struct(col("bin"), col("lo_edge"), col("hi_edge"),
        col("n"), col("cumb"))).as("b"))
      .select(col("q"),
        round(col("b.lo_edge") +
          ((col("q") * col("total") - col("b.cumb")) / col("b.n")) *
            (col("b.hi_edge") - col("b.lo_edge")), 4).as("est"))
  }
}
