package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.hashing
import graft.queries.QueryDSL

/** The persisted IVF index ([[Similarity.buildIvfIndex]] /
  * [[Similarity.ivfProbePersisted]]) must be TRANSPARENT: a probe against
  * the saved tables returns exactly the inline [[Similarity.ivfTopK]]
  * rows, the corpus side enters only through the bucketed assignment
  * table (no assignment recompute, no corpus-sized scan in the probe
  * plan), and the cluster equi-join reads buckets. */
class IvfIndexSpec extends SparkSpec {

  private val prefix = "graft_ivfspec"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private lazy val built: Unit = Similarity.buildIvfIndex(spark, emb,
    "vec_id", "embedding", k = 12, iters = 2,
    path = QueryDSL.scratch("ivfspec_index", sf), prefix = prefix)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid"), col("rank"), col("nid"), col("cos"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("persisted probe ≡ inline ivfTopK (persistence is transparent)") {
    built
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 12, iters = 2)
      .select(col("cid").as("vec_id"), col("cv").as("embedding"))
    val inline = rows(Similarity.ivfTopK(emb, queries, cents,
      "vec_id", "embedding", nProbe = 2, k = 3))
    val probed = rows(Similarity.ivfProbePersisted(spark, queries,
      "vec_id", "embedding", nProbe = 2, k = 3, prefix = prefix))
    assert(probed === inline)
    assert(inline.nonEmpty)
  }

  test("persisted IVF-PQ probe ≡ inline ivfPqTopK with the same " +
      "training parameters (persistence is transparent)") {
    import graft.ops.Checkpoints
    val pqPrefix = "graft_ivfpqspec"
    Similarity.buildIvfPqIndex(spark, emb, "vec_id", "embedding",
      dim = 64, subspaces = 8, coarseK = 12, codebookK = 16,
      path = QueryDSL.scratch("ivfpqspec_index", sf), prefix = pqPrefix)
    val cents = Checkpoints.checkpoint(Similarity.kmeansCentroids(
      emb, "vec_id", "embedding", k = 12, iters = 2))
    val rsd = Checkpoints.checkpoint(Similarity.ivfResiduals(
      emb, "vec_id", "embedding", cents))
    val cbs = Checkpoints.checkpoint(Similarity.pqCodebooks(
      rsd, "id", "rv", dim = 64, subspaces = 8, k = 16))
    val codes = Similarity.pqEncode(rsd, "id", "rv", cbs,
      dim = 64, subspaces = 8)
    def d2rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("rank"), col("nid"), col("d2"))
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = d2rows(Similarity.ivfPqTopK(emb, rsd, codes, cbs,
      cents, queries, "vec_id", "embedding", dim = 64, subspaces = 8,
      nProbe = 2, k = 3, shortlist = 32))
    val probed = d2rows(Similarity.ivfPqProbePersisted(spark, emb,
      queries, "vec_id", "embedding", dim = 64, subspaces = 8,
      nProbe = 2, k = 3, shortlist = 32, prefix = pqPrefix))
    assert(probed === inline)
    assert(inline.nonEmpty)
  }

  test("appendToIvfIndex: probe after append ≡ inline over the grown " +
      "corpus with the original centroids") {
    val prefix2 = "graft_ivfspec2"
    val part = hashing.h64(col("vec_id").cast("string")) % 10000
    val corpus0 = emb.filter(part < 8000)
    val batch = emb.filter(part >= 8000)
    Similarity.buildIvfIndex(spark, corpus0, "vec_id", "embedding", k = 12,
      iters = 2, path = QueryDSL.scratch("ivfspec2_index", sf),
      prefix = prefix2)
    Similarity.appendToIvfIndex(spark, batch, "vec_id", "embedding",
      prefix = prefix2)
    val probed = rows(Similarity.ivfProbePersisted(spark, queries,
      "vec_id", "embedding", nProbe = 2, k = 3, prefix = prefix2))
    // Inline twin: the FULL corpus assigned to the 80%-trained centroids.
    val cents = Similarity.kmeansCentroids(corpus0, "vec_id", "embedding",
        k = 12, iters = 2)
      .select(col("cid").as("vec_id"), col("cv").as("embedding"))
    val inline = rows(Similarity.ivfTopK(emb, queries, cents,
      "vec_id", "embedding", nProbe = 2, k = 3))
    assert(probed === inline)
    assert(inline.nonEmpty)
  }

  test("erasure-masked serve (x19's mechanism): a forget-list anti-join " +
    "on the postings excludes every erased vector with NO rank gap " +
    "(masked probe ≡ probe over an index of only live rows), and an " +
    "index REBUILD over the live store retires the mask") {
    import graft.queries.QueryDSL
    val work = java.nio.file.Files.createTempDirectory("x19spec").toString
    val store = s"$work/store"
    Manifest.commit(emb.select(col("vec_id"), col("embedding"),
      col("label")).coalesce(1), store, statsCols = Seq("vec_id"))
    val px = "graft_x19spec"
    Similarity.buildIvfIndex(spark, Manifest.read(spark, store),
      "vec_id", "embedding", k = 12, iters = 2,
      path = s"$work/ivf", prefix = px)
    val forget = emb.filter(col("vec_id") % 10 === 7).select("vec_id")
    Merge.deleteKeysDv(spark, store, forget, "vec_id")
    val cents = broadcast(spark.table(s"${px}_cents"))
    val probes = Similarity.probeCentroids(queries, cents, "vec_id",
      "embedding", nProbe = 2)
    val masked = rows(Similarity.ivfScoreTail(probes,
      spark.table(s"${px}_ivf").join(
        broadcast(forget.withColumnRenamed("vec_id", "nid")),
        Seq("nid"), "left_anti"), k = 3))
    assert(masked.forall(_._3 % 10 != 7), "no erased id may serve")
    // ≡ a probe against an index holding only live rows (same stale
    // centroids — assignment is per-vector, so masking the postings IS
    // removing the rows)
    val px2 = "graft_x19spec_live"
    val cents2 = spark.table(s"${px}_cents")
    val liveAssigned = Similarity.assignToCentroids(
      Manifest.read(spark, store), broadcast(cents2), "vec_id",
      "embedding")
    val liveProbe = rows(Similarity.ivfScoreTail(probes, liveAssigned,
      k = 3))
    assert(masked === liveProbe, "mask ≡ live-only index, rank-exact")
    // the UNMASKED stale index really would leak (the mask is
    // load-bearing on this corpus)
    val stale = rows(Similarity.ivfScoreTail(probes,
      spark.table(s"${px}_ivf"), k = 3))
    assert(stale.exists(_._3 % 10 == 7), "test corpus must exercise the leak")
    // maintenance retires the mask: rebuildIvfFromTable re-derives the
    // index from the store's RESOLVED head (DVs applied) and returns
    // the captured version — the tail-resume watermark
    val capturedV = Similarity.rebuildIvfFromTable(spark, store,
      "vec_id", "embedding", k = 12, iters = 2,
      path = s"$work/ivf2", prefix = px2)
    assert(capturedV == Manifest.version(store))
    val rebuilt = spark.table(s"${px2}_ivf")
    assert(rebuilt.filter(col("nid") % 10 === 7).isEmpty,
      "a rebuild folds only live rows — the mask retires")
    // the rebuilt index retrains on the live distribution (fresh
    // centroids), so serve-equality is vs ITS own live truth: an
    // unmasked probe of the rebuilt index ≡ inline over the live store
    // with the rebuilt centroids
    val rebuiltProbes = Similarity.probeCentroids(queries,
      broadcast(spark.table(s"${px2}_cents")), "vec_id", "embedding",
      nProbe = 2)
    assert(rows(Similarity.ivfScoreTail(rebuiltProbes, rebuilt, k = 3))
      === rows(Similarity.ivfScoreTail(rebuiltProbes,
        Similarity.assignToCentroids(Manifest.read(spark, store),
          broadcast(spark.table(s"${px2}_cents")), "vec_id",
          "embedding"), k = 3)),
      "post-rebuild probe needs no mask: index ≡ live store")
  }

  test("probe plan: corpus enters ONLY via the bucketed assignment table") {
    built
    val df = Similarity.ivfProbePersisted(spark, queries, "vec_id",
      "embedding", nProbe = 2, k = 3, prefix = prefix)
    df.collect()
    // AQE's toString prints the final plan AND the initial plan — count
    // scans in the final section only.
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // The queries frame reads embeddings.parquet (small side, by
    // contract); the CORPUS must not — its only trace is the index
    // tables. One scan, not two.
    val corpusScans = "embeddings\\.parquet".r.findAllIn(p).size
    assert(corpusScans == 1, s"expected 1 embeddings scan (queries), got $corpusScans:\n$p")
    assert(p.contains("ivfspec_index"), p)
    // No per-probe argmin assignment: the probe never re-aggregates the
    // corpus (the build's min-struct agg is absent from the probe plan).
    assert(!p.contains("partial_min(struct"), p)
  }
}
