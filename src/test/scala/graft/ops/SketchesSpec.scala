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
}
