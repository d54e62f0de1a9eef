package graft.queries

import graft.SparkSpec

/** The w13 EWMA control-chart fold: first-day seeding, the 0.3/0.7
  * update in oracle-replayable op order, the 3-day burn-in, and the
  * PRE-update baseline as the anomaly reference. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaAnomalyFold: seeds on day 1, burn-in suppresses early " +
    "spikes, anomalies compare against the PRE-update baseline") {
    // type A: flat 10s then a 100 spike at index 4 (post burn-in) —
    // exactly one anomaly; the spike then inflates the baseline.
    // type B: a huge day at index 2 (inside burn-in) — zero anomalies.
    val daily = Seq(
      ("A", 1L, 10L), ("A", 2L, 10L), ("A", 3L, 10L), ("A", 4L, 10L),
      ("A", 5L, 100L),
      ("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 500L))
      .toDF("event_type", "day", "cnt")
    val out = WindowAggQueries.ewmaAnomalyFold(daily)
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getLong(3))).toSeq
    // A: e stays 10.0 through day 4, day 5: 100 > 1.5*10 → anomaly,
    // then e = 0.3*100 + 0.7*10 = 37.0
    // B: day 3 spike is at index 2 < burn-in → not counted;
    // e = 0.3*500 + 0.7*5 = 153.5
    assert(out == Seq(("A", 37.0, 1L, 5L), ("B", 153.5, 0L, 3L)), out)
    // arrival order of the input rows is irrelevant: the fold sorts
    val shuffled = WindowAggQueries.ewmaAnomalyFold(
      daily.orderBy(org.apache.spark.sql.functions.rand(7)))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(shuffled == out)
  }
}
