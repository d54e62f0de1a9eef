package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD2 contracts: the no-op change filter, validity chaining, and the
  * incremental identity applyChanges(build(e1), e2) == build(e1 ∪ e2)
  * across every boundary case (mid-dim no-op, boundary no-op, multi-change
  * batch chain, key new in the batch). */
class ScdSpec extends SparkSpec {

  import spark.implicits._

  private val all = Seq(
    (1L, 10.0, 100L, 1L), (1L, 10.0, 200L, 2L), // in-dim no-op repeat
    (1L, 20.0, 300L, 3L), // change inside the dim
    (1L, 20.0, 400L, 4L), // boundary no-op: first batch record repeats
    (1L, 30.0, 500L, 5L), (1L, 40.0, 600L, 6L), // batch chain of changes
    (2L, 5.0, 150L, 7L), // dim-only key, untouched by the batch
    (3L, 7.0, 450L, 8L), (3L, 7.0, 550L, 9L) // key NEW in batch + no-op
  ).toDF("k", "v", "ts", "id")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet

  test("one-shot build: no-ops never open versions; intervals chain") {
    val got = rows(Scd.buildScd2(all, "k", "v", "ts", "id")
      .select(col("k"), col("attr"), col("valid_from"), col("valid_to"),
        col("is_current")))
    val want = Set(
      (1L, 10.0, 100L, 300L, false), (1L, 20.0, 300L, 500L, false),
      (1L, 30.0, 500L, 600L, false), (1L, 40.0, 600L, -1L, true),
      (2L, 5.0, 150L, -1L, true),
      (3L, 7.0, 450L, -1L, true))
    assert(got == want)
  }

  test("incremental fold-in equals the one-shot build over the union") {
    val dim = Scd.buildScd2(all.filter(col("ts") <= 350), "k", "v", "ts",
      "id")
    val folded = Scd.applyChanges(dim, all.filter(col("ts") > 350), "k",
      "v", "ts", "id")
    val oneShot = Scd.buildScd2(all, "k", "v", "ts", "id")
    def norm(df: org.apache.spark.sql.DataFrame) = rows(df.select(col("k"),
      col("attr"), col("valid_from"), col("valid_to"), col("is_current")))
    assert(norm(folded) == norm(oneShot))
    // the batch really closed a previously-open row
    assert(norm(folded).contains((1L, 20.0, 300L, 500L, false)))
  }

  test("property: fold-in == one-shot on random event logs at every " +
      "split point") {
    // deterministic pseudo-random log: 5 keys, 60 events, values drawn
    // from a small alphabet so no-ops and chains both occur frequently
    val events = (0 until 60).map { i =>
      val k = (i * 7919) % 5
      val v = ((i * 104729) % 4).toDouble
      (k.toLong, v, (100 + i * 10).toLong, i.toLong)
    }.toDF("k", "v", "ts", "id")
    def norm(df: org.apache.spark.sql.DataFrame) = rows(df.select(col("k"),
      col("attr"), col("valid_from"), col("valid_to"), col("is_current")))
    val oneShot = norm(Scd.buildScd2(events, "k", "v", "ts", "id"))
    Seq(105L, 255L, 405L, 555L, 695L).foreach { split =>
      val dim = Scd.buildScd2(events.filter(col("ts") <= split), "k", "v",
        "ts", "id")
      val folded = Scd.applyChanges(dim, events.filter(col("ts") > split),
        "k", "v", "ts", "id")
      assert(norm(folded) == oneShot, s"split at $split diverged")
    }
  }

  test("empty batch is the identity") {
    val dim = Scd.buildScd2(all, "k", "v", "ts", "id")
    val folded = Scd.applyChanges(dim, all.filter(col("ts") > 9999L), "k",
      "v", "ts", "id")
    def norm(df: org.apache.spark.sql.DataFrame) = rows(df.select(col("k"),
      col("attr"), col("valid_from"), col("valid_to"), col("is_current")))
    assert(norm(folded) == norm(dim))
  }
}
