package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic most-frequent-value aggregate (SURVEY §2.10, A1).
  *
  * The reference computes per-group mode with
  * `value_counts().idxmax()` (`perustats/infogob/11_locations_refs.py:66-70`);
  * Spark's built-in `mode()` breaks ties nondeterministically, which would be
  * oracle-unstable under distribution. This Aggregator breaks ties by
  * (max count, then lexicographically smallest value) — the same total order
  * a SQL `row_number() OVER (ORDER BY count DESC, value)` oracle produces.
  *
  * Buffer is a plain `Map[String, Long]` of value counts: partial maps merge
  * associatively and commutatively, so map-side partial aggregation applies
  * and shuffle volume is O(distinct values per group), not O(rows).
  */
object ModeAgg extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf else buf.updated(v, buf.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
  }

  override def finish(buf: Map[String, Long]): String =
    if (buf.isEmpty) null
    else buf.minBy { case (v, n) => (-n, v) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: `df.groupBy(k).agg(ModeAgg.column($"x").as("mode_x"))`.
    * Backed by the native [[ModeExact]] TypedImperativeAggregate (compact
    * hand-rolled buffer serialization instead of kryo); this Aggregator
    * remains as the reference implementation — AggSpec asserts both agree.
    */
  def column(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ModeExact(Bridge.expression(c)).toAggregateExpression())
  }

  /** The original Aggregator-based form (kryo buffer; kept as the
    * cross-check twin). */
  def aggregatorColumn(c: Column): Column = udaf(ModeAgg).apply(c)
}
