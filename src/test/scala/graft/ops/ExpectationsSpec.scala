package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-quality gate contracts: exact observed fractions on a planted
  * frame, pass/fail verdicts on both sides of the threshold, and the
  * one-pass promise (everything comes out of a single aggregate). */
class ExpectationsSpec extends SparkSpec {

  import spark.implicits._
  import Expectations._

  private val df = Seq(
    (1L, Some("a"), 5.0), (2L, Some("b"), 15.0), (3L, None, 25.0),
    (4L, Some("a"), 35.0), (4L, Some("z"), 200.0) // dup key + out-of-set
  ).toDF("id", "tag", "x")

  test("observed fractions are exact and verdicts flip at the threshold") {
    val got = validate(df, Seq(
      complete("tag_complete", col("tag")),
      unique("id_unique", Seq(col("id"))),
      inRange("x_range", col("x"), 0, 100, minimum = 0.8),
      inSet("tag_domain", col("tag"), Seq("a", "b"), minimum = 0.5)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got("tag_complete") == ((0.8, 1.0, false)))
    assert(got("id_unique") == ((0.8, 1.0, false))) // 4 distinct / 5
    assert(got("x_range") == ((0.8, 0.8, true))) // boundary: >= passes
    assert(got("tag_domain") == ((0.6, 0.5, true)))
  }

  test("null values fail range checks and are skipped by inSet") {
    val d2 = Seq((1L, Option.empty[Double])).toDF("id", "x")
    val got = validate(d2, Seq(
      inRange("x_range", col("x"), 0, 1)))
      .collect().head
    assert(got.getDouble(1) == 0.0 && !got.getBoolean(3))
  }

  test("all checks evaluate in one aggregate (single scan, no join)") {
    val plan = validate(df, Seq(
      complete("c", col("tag")),
      inRange("r", col("x"), 0, 100))).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.split("LocalTableScan|Scan ").length <= 3, plan)
  }
}
