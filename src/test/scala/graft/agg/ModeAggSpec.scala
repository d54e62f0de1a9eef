package graft.agg

import graft.SparkSpec

class ModeAggSpec extends SparkSpec {
  import spark.implicits._

  test("mode picks most frequent; ties break to smallest value") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"),
      ("g2", "z"), ("g2", "y"), // tie -> "y"
      ("g3", "only")
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(ModeAgg.column($"v").as("m"))
      .orderBy("k").as[(String, String)].collect()
    assert(out.toSeq === Seq(("g1", "b"), ("g2", "y"), ("g3", "only")))
  }

  test("native TypedImperativeAggregate agrees with the Aggregator twin") {
    val df = graft.queries.QueryDSL.T(spark, sf, "orders")
    val fast = df.groupBy("o_orderstatus")
      .agg(ModeAgg.column($"o_orderpriority").as("m"))
      .as[(String, String)].collect().toSet
    val ref = df.groupBy("o_orderstatus")
      .agg(ModeAgg.aggregatorColumn($"o_orderpriority").as("m"))
      .as[(String, String)].collect().toSet
    assert(fast == ref)
  }

  test("mode ignores nulls and is stable under repartition") {
    val df = Seq(("g", Option("x")), ("g", None), ("g", Option("x")), ("g", Option("w")))
      .toDF("k", "v")
    for (parts <- Seq(1, 3, 7)) {
      val out = df.repartition(parts).groupBy("k")
        .agg(ModeAgg.column($"v").as("m")).as[(String, String)].collect()
      assert(out.toSeq === Seq(("g", "x")))
    }
  }
}
