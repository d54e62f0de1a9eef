package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The auto-k contract ([[Similarity.kmeansCentroidsAutoK]]): k grows with
  * the corpus (k = ceil(n / target)), and because seeding is hash-uniform
  * over the corpus, a DOMINANT semantic blob draws seeds in proportion to
  * its mass and splits into ~target-sized cells — the per-cluster prune
  * volume a fixed hand-tuned k cannot bound. Planted-skew pattern as in
  * d2c: half the corpus is one near-duplicate blob. */
class AutoKSpec extends SparkSpec {

  private val n = 1200
  private val dim = 8
  private val target = 50

  // Deterministic synthetic corpus: ids [0, 600) are one tight blob around
  // the all-ones direction (±2% jitter); ids [600, 1200) scatter
  // pseudo-uniformly. No RNG — components are integer-arithmetic folds of
  // (id, dim), so the spec replays identically everywhere.
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = (0 until dim).map { j =>
        if (i < n / 2) 1.0 + 0.02 * (((i * 31 + j * 17) % 13) - 6) / 6.0
        else (((i * 2654435761L + j * 40503L) % 1000L) - 500L) / 500.0
      }.toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def clusterSizes(cents: DataFrame): Map[Long, Long] =
    corpus.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(min(struct(
        negate(Similarity.cosine(col("embedding"), col("cv"))).as("negcos"),
        col("cid").as("cid"))).as("__best"))
      .groupBy(col("__best.cid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("auto-k splits a 50%-mass blob into ~target-sized cells") {
    val cents = Similarity.kmeansCentroidsAutoK(corpus, "vec_id",
      "embedding", targetClusterSize = target, iters = 2)
    val sizes = clusterSizes(cents)
    assert(sizes.values.sum === n.toLong)
    // Seeding starts at k = ceil(n/target); Lloyd's rounds may retire
    // centroids whose members all drift to a near-identical rival (the
    // planted blob's seeds are near-collinear), so the surviving count
    // sits in (k/4, k] — what matters is the SIZE bound below, not that
    // every seed survives.
    val k = math.ceil(n.toDouble / target).toLong
    assert(cents.count() <= k && cents.count() > k / 4)
    // The bound the contract promises: no cluster — the planted blob's
    // cells included — exceeds a small multiple of the target size, so
    // per-cluster prune candidates stay ~target² (4× slack for the
    // hash-binomial seed draw and Lloyd drift).
    val maxSize = sizes.values.max
    assert(maxSize <= 4L * target, s"max cluster $maxSize > ${4 * target}")
    // Total prune candidate volume Σ|c|² is then linear in n, not n²/4.
    val volume = sizes.values.map(s => s * s).sum
    assert(volume <= n.toLong * 4L * target,
      s"candidate volume $volume not O(n·target)")
  }

  test("fixed small k concentrates the blob — the failure auto-k prevents") {
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      k = 4, iters = 2)
    val sizes = clusterSizes(cents)
    // The blob lands (near-)whole in one cluster: prune volume ≥ ~(n/2)².
    assert(sizes.values.max >= (n / 2 * 9L) / 10,
      s"expected a ≥${n / 2}-ish giant cluster, got ${sizes.values.max}")
  }
}
