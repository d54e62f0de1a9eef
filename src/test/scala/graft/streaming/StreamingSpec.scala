package graft.streaming

import graft.SparkSpec
import graft.queries.QueryDSL

/** The stateful streaming paths must reproduce their batch twins exactly
  * (the batch twins are what the DuckDB oracle checks). */
class StreamingSpec extends SparkSpec {

  test("streaming sessionization == batch sessionization") {
    val batch = Streams.sessionizeBatch(QueryDSL.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streaming = Streams.sessionizeStreaming(spark, sf, name = "st2_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streaming == batch)
  }

  test("streaming tumbling window == batch tumbling window") {
    val batch = Streams.tumblingCounts(QueryDSL.events(spark, sf))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val streaming = Streams.runTumblingToMemory(spark, sf, name = "st1_spec")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streaming == batch)
  }
}
