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

  test("ofTable resolves an existing table's bucketSpec, ignoring the " +
    "environment — append/stage layouts must match the live table") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS buckets_spec_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(3, col("id"))
      .write.mode("overwrite").bucketBy(3, "id")
      .option("path", "/tmp/graft_buckets_spec_t")
      .saveAsTable("buckets_spec_t")
    // a session resolving a DIFFERENT environment count still gets the
    // table's own 3 — the drain-child-session scenario (index built on
    // the parent at one width, staged in a child at another)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.index.buckets", "12")
    assert(Buckets.ofTable(s2, "buckets_spec_t") == 3)
    assert(Buckets.ofTable(spark, "buckets_spec_t") == 3)
    // explicit argument remains the deliberate re-bucket override
    assert(Buckets.ofTable(spark, "buckets_spec_t", 5) == 5)
    spark.sql("DROP TABLE IF EXISTS buckets_spec_t")
  }
}
