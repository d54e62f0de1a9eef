package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-distribution properties of the shared t31/st20 JS tail:
  * identical sides diverge 0, disjoint sides diverge exactly ln 2 (the
  * JS maximum), and the vocab columns count each side's support. The
  * value-level gate is the DuckDB oracle; this pins the math at the
  * endpoints the corpus can't reach. */
class JsDivergenceSpec extends SparkSpec {
  import spark.implicits._

  private val LN2 = math.round(math.log(2.0) * 1e6) / 1e6

  private def js(rows: Seq[(String, Int, String, Long)]) =
    TextQueries.jsDivergenceTail(
        rows.toDF("lang", "side", "t", "c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("identical distributions diverge 0; fully disjoint ones ln 2") {
    val r = js(Seq(
      // lang "same": both sides hold the identical distribution
      ("same", 0, "a", 3L), ("same", 0, "b", 1L),
      ("same", 1, "a", 3L), ("same", 1, "b", 1L),
      // lang "disj": no shared token at all — the JS maximum
      ("disj", 0, "x", 5L), ("disj", 0, "y", 1L),
      ("disj", 1, "z", 2L)))
    assert(r("same") == ((0.0, 2L, 2L, 2L)))
    val (d, va, vb, shared) = r("disj")
    assert(d == LN2, s"disjoint JS must be ln 2, got $d")
    assert((va, vb, shared) == ((2L, 1L, 0L)))
  }

  test("divergence is symmetric in the sides and between the endpoints " +
    "for a partial overlap") {
    val ab = js(Seq(("l", 0, "a", 1L), ("l", 0, "b", 1L),
      ("l", 1, "a", 1L), ("l", 1, "c", 1L)))("l")
    val ba = js(Seq(("l", 1, "a", 1L), ("l", 1, "b", 1L),
      ("l", 0, "a", 1L), ("l", 0, "c", 1L)))("l")
    assert(ab._1 == ba._1, "JS must be symmetric")
    assert(ab._1 > 0.0 && ab._1 < LN2,
      s"partial overlap must sit strictly between endpoints: ${ab._1}")
    assert(ab._4 == 1L, "one shared token")
  }
}
