package graft.ops

import graft.SparkSpec

/** Focused spec for the r17 scale-adaptive index bucket count: explicit
  * argument > `spark.graft.index.buckets` conf > session shuffle
  * partitions. Layout-only — the index specs (IncrementalIndexSpec,
  * TextIndexSpec, IvfIndexSpec) prove probe results are bucket-count
  * independent; this pins the resolution order itself. */
class BucketsSpec extends SparkSpec {

  test("explicit bucket argument wins over the session conf") {
    assert(Buckets.resolve(spark, 5) == 5)
  }

  test("0 (auto) resolves from spark.graft.index.buckets when set") {
    // SparkSpec pins the conf to 8 for the suites' historical layout.
    assert(Buckets.resolve(spark, 0) == 8)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.index.buckets", "12")
    assert(Buckets.resolve(s2, 0) == 12)
  }

  test("0 (auto) falls back to the session's shuffle partitions when " +
    "the conf is absent") {
    val s2 = spark.newSession()
    s2.conf.unset("spark.graft.index.buckets")
    s2.conf.set("spark.sql.shuffle.partitions", "6")
    assert(Buckets.resolve(s2, 0) == 6)
    s2.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
