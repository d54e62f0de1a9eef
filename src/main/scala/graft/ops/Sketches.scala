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
}
