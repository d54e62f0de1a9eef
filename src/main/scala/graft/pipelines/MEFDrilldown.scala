package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.DrillStep

/** The MEF "Consulta Amigable" drill-down (SURVEY §3.3) re-expressed as
  * declarative aggregation over an ingested fact table: each recorded click
  * path (filter at a level, expand the next level) is exactly a
  * filter + groupBy over the level columns — the recursive HTTP navigation
  * (`perustats/MEF/scrapper.py:129-208`) survives only as an ingest
  * utility producing the fact table, and whole MEF workflows collapse to
  * one Catalyst plan (filter pushdown + a single shuffle per aggregate).
  */
object MEFDrilldown {

  /** Execute a drill workflow: apply each step's regex row filter, group by
    * all step levels in order, sum the measures. The result has one row per
    * surviving leaf path — the same shape the reference assembles by
    * recursive HTTP clicks (one metadata column per level).
    */
  def run(fact: DataFrame, steps: Seq[DrillStep], measures: Seq[String])
      : DataFrame = {
    val filtered = steps.foldLeft(fact) { (df, s) =>
      s.keepMatching.fold(df)(re => df.filter(lower(col(s.level)).rlike(re)))
    }
    val levels: Seq[Column] = steps.map(s => col(s.level))
    filtered.groupBy(levels: _*)
      .agg(measures.head match { case m => sum(col(m).cast("decimal(18,2)")).cast("double").as(m) },
        measures.tail.map(m =>
          sum(col(m).cast("decimal(18,2)")).cast("double").as(m)): _*)
  }

  /** All rollup totals along the drill path in one pass (the full subtotal
    * tree a user would reach by clicking every path prefix). */
  def rollupAll(fact: DataFrame, steps: Seq[DrillStep], measure: String)
      : DataFrame = {
    val levels: Seq[Column] = steps.map(s => col(s.level))
    fact.rollup(levels: _*)
      .agg(grouping_id().as("gid"),
        sum(col(measure).cast("decimal(18,2)")).cast("double").as(measure),
        count(lit(1)).as("cnt"))
  }
}
