package graft.queries

import graft.SparkSpec

/** The w12/st30 grid + forward-fill tail: the grid must run per user
  * from FIRST ACTIVITY to the GLOBAL horizon (not the user's own last
  * day), gaps fill from the last observation, and the leading grid day
  * is always observed (fill starts at a day with data, so value_filled
  * is never null). */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFfillTail: global horizon, per-user start, gap fill, " +
    "observed flags") {
    val daily = Seq((1L, 1L, 10.0), (1L, 3L, 30.0), (2L, 2L, 20.0))
      .toDF("user_id", "d", "v")
    val out = WindowAggQueries.resampleFfillTail(daily)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, 1L, 10.0, true),  // first activity: observed
      (1L, 2L, 10.0, false), // gap day: carried forward
      (1L, 3L, 30.0, true),  // new observation replaces the carry
      (2L, 2L, 20.0, true),  // user 2 starts at ITS first day...
      (2L, 3L, 20.0, false)) // ...but runs to the GLOBAL horizon (3)
    )
  }
}
