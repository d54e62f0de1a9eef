package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.ModeAgg
import graft.functions.expressions
import graft.ops.Relational

/** The infogob locations-consolidation stage (SURVEY §3, stage `11`;
  * reference `perustats/infogob/11_locations_refs.py`) as one declarative
  * pipeline: diagonal-union the per-election CSV frames, derive the request
  * id by the dist→prov→region cascade, normalize names (accent-strip,
  * uppercase, alnum-only, collapsed), and per (region, prov, dist) id
  * triple — nulls grouped like pandas `dropna=False` — pick the most
  * frequent cleaned name via the deterministic mode aggregate.
  */
object InfogobLocations {

  /** `clean_text`: accent-strip → upper → non-alnum → space → collapse. */
  def cleanLocationName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(upper(expressions.stripAccents(c)), "[^A-Z0-9]", " "),
      "\\s+", " "))

  /** The dist→prov→region id cascade
    * (`11_locations_refs.py:21-28`). */
  def locationRequestId: Column =
    coalesce(col("id_distrito"), col("id_provincia"), col("id_region"))
      .as("id_location_req")

  /** Consolidate raw location frames into one row per id triple with the
    * modal cleaned names. Nulls in the cleaned name are ignored by the mode
    * (pandas `dropna()` inside `most_common`); null group KEYS are kept. */
  def consolidate(frames: Seq[DataFrame]): DataFrame = {
    val raw = Relational.unionDiagonal(frames)
      .withColumn("id_location_req", locationRequestId)
    raw.groupBy(col("id_region"), col("id_provincia"), col("id_distrito"))
      .agg(
        ModeAgg.column(cleanLocationName(col("region"))).as("region"),
        ModeAgg.column(cleanLocationName(col("name_provincia"))).as("provincia"),
        ModeAgg.column(cleanLocationName(col("name_distrito"))).as("distrito"))
  }
}
