package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.hashing

/** The sharded Bloom filter ([[Dedup.bloomBitmapSharded]] /
  * [[Dedup.bloomMightContainSharded]]) must be BIT-IDENTICAL to the 1-row
  * broadcast filter — same global bit domain, different physical layout —
  * at any shard count, including its false-positive set. */
class BloomShardedSpec extends SparkSpec {

  private val m = 1 << 14
  private val probes = 3

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private def coin = hashing.h64(col("doc_id").cast("string")) % 10000

  private lazy val evalSet = Dedup.hashedShingles(
    docs.filter(coin >= 5000), "doc_id", "text", k = 8)
    .select(col("h")).distinct().cache()
  private lazy val trainHashes = Dedup.hashedShingles(
    docs.filter(coin < 5000), "doc_id", "text", k = 8)
    .select(col("h")).distinct().cache()

  private lazy val unshardedPass: Set[Long] = {
    val bitmap = Dedup.bloomBitmap(evalSet, "h", m, probes)
    Dedup.bloomMightContain(bitmap, trainHashes, "h", m, probes)
      .collect().map(_.getLong(0)).toSet
  }

  for (shards <- Seq(4, 16)) {
    test(s"$shards-shard pass set is bit-identical to the 1-row filter") {
      val bitmaps = Dedup.bloomBitmapSharded(evalSet, "h", m, probes, shards)
      // Layout sanity: one dense slice per shard, each m/shards bits.
      val rows = bitmaps.collect()
      assert(rows.length === shards)
      assert(rows.forall(_.getSeq[Long](1).length === m / shards / 64))
      val pass = Dedup.bloomMightContainSharded(bitmaps, trainHashes, "h",
        m, probes, shards).collect().map(_.getLong(0)).toSet
      assert(pass === unshardedPass)
      assert(unshardedPass.nonEmpty) // non-vacuous: real contamination hits
    }
  }

  test("signed production hashes: sharded pass set still bit-identical " +
      "(pmod normalization on both build and probe)") {
    import spark.implicits._
    // Raw xxhash64-style SIGNED longs — the input class whose negative
    // probe positions the unsharded build had to pmod-normalize (round-6
    // hardening); the sharded twin must inherit the same contract.
    def member(i: Int): Long = i.toLong * -2654435761L + (i % 7) * 40503L
    val signed = Seq.tabulate(500)(member).toDF("h")
    // 50 true members (guaranteed hits) + 750 outsiders (FP fodder).
    val probe = Seq.tabulate(800)(i =>
      if (i < 50) member(i * 9) else i.toLong * -9221077L + 31L).toDF("h")
    val m1 = Dedup.bloomBitmap(signed, "h", m, probes)
    val base = Dedup.bloomMightContain(m1, probe, "h", m, probes)
      .collect().map(_.getLong(0)).toSet
    for (shards <- Seq(4, 16)) {
      val ms = Dedup.bloomBitmapSharded(signed, "h", m, probes, shards)
      val pass = Dedup.bloomMightContainSharded(ms, probe, "h", m, probes,
        shards).collect().map(_.getLong(0)).toSet
      assert(pass === base, s"shards=$shards diverged")
    }
    assert(base.nonEmpty) // planted overlap via the shared (i % 7) residue
  }

  test("e8 query result equals e7 exactly (same counts, sharded layout)") {
    val e7 = graft.SparkEntry.queries("e7_bloom_decontaminate")(spark, sf)
    val e8 = graft.SparkEntry.queries("e8_bloom_sharded")(spark, sf)
    assert(e8.columns.toSeq === e7.columns.toSeq)
    assert(e8.collect().toSeq === e7.collect().toSeq)
  }
}
