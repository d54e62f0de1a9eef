package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.textstats

/** Count-min sketch contracts: bounded size, upper-bound estimates,
  * visible collisions under a narrow grid, and the merge associativity
  * that makes the sketch distributed-native. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def corpusToks = spark.read
    .parquet(s"$sf/documents.parquet")
    .select(explode(textstats.tokens(col("text"))).as("token"))

  test("sketch holds <= depth*width rows and every estimate >= true count") {
    val toks = corpusToks
    val sk = Sketches.countMin(toks, "token", depth = 4, width = 1024)
    assert(sk.count() <= 4L * 1024L)
    val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.countMinEstimate(sk, truth, "token", 4, 1024)
      .collect().map(r =>
        (r.getAs[Long]("true_cnt"), r.getAs[Long]("cms_est")))
    assert(est.nonEmpty)
    assert(est.forall { case (t, e) => e >= t },
      "count-min must never underestimate")
  }

  test("narrow grid (width 4) forces collisions: some estimate overshoots") {
    val toks = corpusToks
    val sk = Sketches.countMin(toks, "token", depth = 2, width = 4)
    val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.countMinEstimate(sk, truth, "token", 2, 4)
      .collect().map(r =>
        (r.getAs[Long]("true_cnt"), r.getAs[Long]("cms_est")))
    assert(est.exists { case (t, e) => e > t },
      "a 2x4 grid over a full vocabulary must collide somewhere")
    assert(est.forall { case (t, e) => e >= t })
  }

  test("sketches of disjoint slices re-aggregate into the union's sketch") {
    val toks = corpusToks.withColumn("half",
      graft.functions.hashing.h64(col("token")) % 2)
    val a = Sketches.countMin(toks.filter(col("half") === 0), "token", 3, 64)
    val b = Sketches.countMin(toks.filter(col("half") === 1), "token", 3, 64)
    val merged = a.unionByName(b)
      .groupBy(col("d"), col("bucket")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.countMin(toks, "token", 3, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("planted key: estimate is exact when its cells are collision-free") {
    val keys = (Seq.fill(100)("hot") ++ (1 to 50).map(i => s"cold$i"))
      .toDF("k")
    val sk = Sketches.countMin(keys, "k", depth = 4, width = 4096)
    val est = Sketches.countMinEstimate(sk, Seq("hot").toDF("k"), "k",
        4, 4096)
      .collect().head.getAs[Long]("cms_est")
    // 151 occurrences into 4x4096 cells: the chance any of hot's 4 cells
    // collides is tiny and deterministic (fixed md5 hashes) — exact here.
    assert(est == 100L)
  }

  test("histogram: bins partition the rows, clamp catches v = hi, " +
    "bounded rows") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice"))
    val h = Sketches.equiWidthHistogram(li, "l_extendedprice", bins = 16)
      .collect()
    assert(h.length <= 16)
    assert(h.map(_.getAs[Long]("n")).sum == li.count())
    val bins = h.map(_.getAs[Long]("bin")).toSet
    assert(bins.forall(b => b >= 0 && b <= 15))
    // the row holding the max value must land in the LAST bin (the clamp)
    assert(bins.contains(15L))
  }

  test("histogram: pinned-bounds slice histograms merge into the union's") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice"), col("l_orderkey"))
    val bounds = Some((900.0, 105000.0))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mass"))).toMap
    val a = Sketches.equiWidthHistogram(li.filter(col("l_orderkey") % 2 === 0),
      "l_extendedprice", 8, bounds)
    val b = Sketches.equiWidthHistogram(li.filter(col("l_orderkey") % 2 === 1),
      "l_extendedprice", 8, bounds)
    val merged = a.unionByName(b)
      .groupBy(col("bin"), col("lo_edge"), col("hi_edge"))
      .agg(sum(col("n")).as("n"),
        round(sum(col("mass").cast("decimal(18,2)")).cast("double"), 2)
          .as("mass"))
    val whole = Sketches.equiWidthHistogram(li, "l_extendedprice", 8, bounds)
    assert(cells(merged) == cells(whole))
  }

  test("histogramQuantiles: exact on a uniform planted distribution, " +
    "monotone, and within one bin width of the true quantile") {
    import spark.implicits._
    // 1000 values 1..1000 over pinned bounds [0, 1000], 10 bins of 100:
    // cum counts are exact multiples, so interpolation is near-exact
    val vals = (1 to 1000).map(_.toDouble).toDF("v")
    val hist = Sketches.equiWidthHistogram(vals, "v", bins = 10,
      bounds = Some((0.0, 1000.0)))
    val est = Sketches.histogramQuantiles(hist, Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est"))
      .toMap
    assert(math.abs(est(0.1) - 100.0) <= 1.0, est.toString)
    assert(math.abs(est(0.5) - 500.0) <= 1.0, est.toString)
    assert(math.abs(est(0.9) - 900.0) <= 1.0, est.toString)
    // real data: estimates are monotone in q and within one bin width
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice"))
    val h2 = Sketches.equiWidthHistogram(li, "l_extendedprice", 16)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val e2 = Sketches.histogramQuantiles(h2, qs).collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    assert(qs.map(e2).sliding(2).forall(p => p.head <= p.last))
    val width = h2.collect().map(r =>
      r.getAs[Double]("hi_edge") - r.getAs[Double]("lo_edge")).max
    val exact = li.stat.approxQuantile("l_extendedprice",
      qs.toArray, 0.0)
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(e2(q) - ex) <= width,
        s"q=$q est=${e2(q)} exact=$ex width=$width")
    }
  }

  test("KLL and theta sketches shard: per-shard partials merge into " +
    "answers within the one-shot bounds (a15/a16's scale contract)") {
    val ev = graft.queries.QueryDSL.events(spark, sf)
      .select(col("value"), col("user_id"), col("event_id"))
    val parts = ev.withColumn("shard", pmod(col("event_id"), lit(4)))
      .groupBy(col("shard"))
      .agg(kll_sketch_agg_double(col("value"), 200).as("ksk"),
        theta_sketch_agg(col("user_id")).as("tsk"))
    assert(parts.count() == 4)
    val merged = parts.agg(
        kll_sketch_get_quantile_double(
          kll_merge_agg_double(col("ksk"), 200), lit(0.5)).as("p50"),
        theta_sketch_estimate(theta_union_agg(col("tsk"))).as("users"))
      .head
    // KLL guarantee lives in RANK space: the merged sketch's median
    // estimate must sit at empirical CDF 0.5 ± 0.05
    val n = ev.count().toDouble
    val rank = ev.filter(col("value") <= merged.getDouble(0)).count() / n
    assert(math.abs(rank - 0.5) <= 0.05, s"merged p50 rank $rank")
    // theta union of shard sketches lands within 5% of the exact distinct
    val exactUsers = ev.agg(countDistinct(col("user_id")).as("u"))
      .head.getLong(0)
    assert(math.abs(merged.getLong(1) - exactUsers) <= 0.05 * exactUsers,
      s"merged theta ${merged.getLong(1)} vs exact $exactUsers")
  }

  test("frequent-items sketch (a17): exact in the no-purge regime; in " +
    "the purge regime planted heavies survive with |err| <= 3.5*N/cap") {
    import spark.implicits._
    // no-purge regime — the corpus's 31-token vocabulary under a
    // 256-capacity sketch: every estimate must EQUAL the exact count
    // (the claim a17's est_ok hash row rides on)
    val toks = corpusToks
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val noPurge = toks
      .agg(expr(
        "approx_top_k_estimate(approx_top_k_accumulate(token, 256), 256)")
        .as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noPurge == exact,
      "under-capacity sketch must be exact counter addition")
    // purge regime — 5005 distinct tokens under capacity 64: the
    // Misra-Gries purge fires, and the production guarantees take over:
    // items with freq > eps*N survive (no false negatives) and every
    // surviving estimate sits within eps*N of truth, eps = 3.5/capacity
    val heavies = (0 until 5).flatMap(h => Seq.fill(3000)(s"heavy_$h"))
    val tail = (0 until 5000).flatMap(t => Seq.fill(2)(s"tail_$t"))
    val stream = heavies ++ tail
    val bound = 3.5 * stream.size / 64
    assert(bound < 3000, "planted heavies must clear the error threshold")
    val est = stream.toDF("token").repartition(8)
      .agg(expr(
        "approx_top_k_estimate(approx_top_k_accumulate(token, 64), 64)")
        .as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= 64)
    for (h <- 0 until 5) {
      val k = s"heavy_$h"
      assert(est.contains(k),
        s"$k (freq 3000 > eps*N = $bound) must survive every purge")
      assert(math.abs(est(k) - 3000.0) <= bound,
        s"$k estimate ${est(k)} drifted past the eps*N bound $bound")
    }
  }
}
