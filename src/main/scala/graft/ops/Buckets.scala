package graft.ops

import org.apache.spark.sql.SparkSession

/** Scale-adaptive bucket count for the persisted index tables
  * ([[DedupIndex]], [[Similarity]] IVF/IVF-PQ postings, [[TextIndex]]
  * BM25 postings).
  *
  * The bucket count is pure LAYOUT — it never changes what any probe or
  * build computes — but it caps the parallelism of every stage that rides
  * the bucketing: a bucketed-by-id table scan yields one partition per
  * bucket, so the signature aggregation over a persisted shingle table,
  * the band-bucket equi-joins, the IVF postings scoring scan and the BM25
  * postings probes all run at most `buckets`-wide. The historical fixed
  * 8 serialized those CPU-heavy stages onto 8 of the 32 local cores (and
  * would be absurd at cluster scale — guide §2.2/§6: partition counts must
  * derive from the environment, not a constant tuned for either mode).
  *
  * Resolution: `spark.graft.index.buckets` when set (the production knob —
  * size it so each bucket holds 100 MB–1 GB of postings at the corpus's
  * scale), else the session's shuffle partitions (which the bench/Verify
  * mains already derive from the core count, keeping local runs
  * comparable). Explicit `buckets > 0` arguments win unchanged; 0 = auto.
  *
  * Append/stage consistency: every build/append/stage call in one session
  * resolves the same value, so staged deltas always match the live table's
  * layout. Cross-session appends onto a table built under a different
  * bucket count are rejected by Spark's bucket-spec validation (loud, not
  * corrupting) — same contract as before, just with the count now
  * environment-derived.
  */
object Buckets {
  def resolve(spark: SparkSession, buckets: Int): Int =
    if (buckets > 0) buckets
    else spark.conf.getOption("spark.graft.index.buckets").map(_.toInt)
      .getOrElse(spark.sessionState.conf.numShufflePartitions)

  /** Bucket count for an append/stage/compact against an EXISTING live
    * table: the table's own catalog bucketSpec, NOT the environment. An
    * environment-derived count is only safe when it provably equals the
    * table's (same session, same conf) — but the streaming fold-ins
    * stage inside drain child sessions whose conf differs from the
    * session that built the index, and [[FoldFiles.linkAppend]] publishes
    * by file link with no bucket-spec validation, so an
    * environment-resolved stage could silently link N-bucketed files
    * into an M-bucket table (durably mis-bucketed: any plan trusting the
    * layout — pruning, shuffle elision — would return wrong rows). The
    * live table's spec is the single source of truth; explicit
    * `buckets > 0` still wins (the caller asserting a re-bucket, only
    * meaningful for full-overwrite rebuilds). Falls back to
    * [[resolve]] when the table has no bucket spec (not reachable for
    * the index tables, which are always written bucketed). */
  def ofTable(spark: SparkSession, table: String, buckets: Int = 0): Int =
    if (buckets > 0) buckets
    else spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(resolve(spark, 0))
}
