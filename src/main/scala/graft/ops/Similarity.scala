package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.hashing

/** Embedding similarity search (north-star extension; no equivalent in the
  * reference). Vectors are `array<float>` columns; all arithmetic runs in
  * double via higher-order functions (codegen'd, no UDFs).
  *
  * Determinism: dot products and norms are strict left-to-right folds
  * (`aggregate`), so the result is a fixed IEEE-754 double regardless of
  * partitioning — and bit-identical to the DuckDB oracle's `list_reduce`
  * fold. Ranking ties break on the neighbor id.
  *
  * Scale design (100 TB):
  *  - Brute-force top-k broadcasts the (small) query set and makes ONE pass
  *    over the corpus: per query the work is a map + a top-k aggregation
  *    (no shuffle of the corpus, only of k·|queries| candidate rows).
  *  - The hyperplane-LSH variant buckets the corpus by an 8-bit signature
  *    (one cheap column transform), so each query only scans its bucket —
  *    the standard memory/recall trade; bucket skew is bounded because the
  *    planes are data-independent.
  */
object Similarity {

  /** Strict-left-fold dot product of two numeric-array columns, in double.
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression —
    * identical fold order (and therefore bits) to the interpreted
    * `aggregate(zip_with(...))` formulation and the oracle's `list_reduce`,
    * but a primitive loop inside whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). `queries` must be small enough to
    * broadcast; corpus-side the plan is scan → map → per-query top-k. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .join(q, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Number of random hyperplanes = signature bits. */
  val Planes = 8

  /** Deterministic hyperplane for plane j at dimensionality `dim`, as a
    * literal array column (both engines derive the identical values from
    * the shared md5-based hash — see [[hashing.hyperplane]]). */
  def planeArray(j: Int, dim: Int): Column =
    array((0 until dim).map(c => lit(hashing.hyperplane(j, c))): _*)

  /** 8-bit hyperplane-LSH signature of a float-array column. */
  def lshBucket(vec: Column, dim: Int): Column =
    (0 until Planes).map { j =>
      when(dot(vec, planeArray(j, dim)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: assign every corpus vector to its nearest centroid (one
    * broadcast pass), then each query probes only the `nProbe` centroids
    * nearest to it and ranks within those inverted lists. Centroids are
    * caller-supplied (k-means offline, or any deterministic subset) — the
    * index build is a column transform, so it scales as a scan. Recall
    * depends on nProbe/centroid quality; exactness is not claimed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    val cents = broadcast(
      centroids.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    def nearest(df: DataFrame, id: String, vec: String, n: Int,
        out: String): DataFrame =
      df.crossJoin(cents)
        .withColumn("__cos", cosine(col(vec), col("cv")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(id)).orderBy(col("__cos").desc, col("cid"))))
        .filter(col("__rn") <= n)
        .select(col(id), col(vec), col("cid").as(out))
    val assigned = nearest(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")),
      "nid", "nv", 1, "cluster")
    val probes = nearest(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")),
      "qid", "qv", nProbe, "cluster")
    val scored = probes.join(assigned, Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN top-k: queries only compare against corpus vectors in their own
    * hyperplane bucket. Recall < 1 by construction (a near neighbor across
    * a plane is missed) — that is the documented trade; multi-probe or
    * repeated plane sets raise recall at proportional cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      lshBucket(col(vecCol), dim).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), dim).as("bucket")))
    val scored = c.join(q, Seq("bucket")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("bucket"), col("nid"),
        round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
