package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{DrillStep, MefStep, MefToken}
import graft.model.MefToken.{ClickBtn, Rows, SavePartial, Search}

/** Parser + declarative bridge for the MEF workflow token IR: a user writes
  * the drill-down as a flat token list (the reference's debugging-friendly
  * notation), [[parse]] groups it into [[MefStep]] blocks with the exact
  * contract of the reference parser (`perustats/MEF/steps/workflow.py:30-67`),
  * and [[toDrillSteps]]/[[run]] lower the parsed workflow onto the engine's
  * declarative drill model ([[MEFDrilldown]]) — the recursive HTTP clicks
  * collapse into one Catalyst plan. [[searchPredicate]] lowers the Search
  * token onto the DSv2 search pushdown
  * ([[graft.sources.SearchablePageFetcher]]), so the reference's ">400 rows
  * → use the panel" behavior happens inside the scan instead of in driver
  * code.
  */
object MEFWorkflow {

  /** Public button ids of the MEF "Consulta Amigable" UI (ASP.NET control
    * names; reference `perustats/MEF/constants/buttons.py`). The `Btn`
    * suffix is what [[MefToken.ClickBtn]] derives the drill column from. */
  object buttons {
    val NivelGobierno = "ctl00$CPH1$BtnTipoGobierno"
    val SubTipoGobierno = "ctl00$CPH1$BtnSubTipoGobierno"
    /** Alias: local governments + mancomunidades share the sub-type panel. */
    val GobLocalesMancomunidades: String = SubTipoGobierno
    val Generica = "ctl00$CPH1$BtnGenerica"
    val SubGenerica = "ctl00$CPH1$BtnSubGenerica"
    val Especifica = "ctl00$CPH1$BtnEspecifica"
    val Mes = "ctl00$CPH1$BtnMes"
    val Departamento = "ctl00$CPH1$BtnDepartamento"
    val Municipalidad = "ctl00$CPH1$BtnMunicipalidad"
    val Funcion = "ctl00$CPH1$BtnFuncion"
    val Fuente = "ctl00$CPH1$BtnFuenteAgregada"
    val Rubro = "ctl00$CPH1$BtnRubro"
  }

  /** Parse the flat token list into step blocks — the exact contract of the
    * reference parser (`workflow.py:30-67`): every block begins with `Rows`
    * (anything else fails loudly with its position); the block then consumes
    * tokens until the next `Rows` or the end, later tokens of the same type
    * overwriting earlier ones; a block without a `ClickBtn` is an error. */
  def parse(raw: Seq[MefToken]): Seq[MefStep] = {
    val result = Seq.newBuilder[MefStep]
    var i = 0
    while (i < raw.length) {
      val rows = raw(i) match {
        case r: Rows => r
        case other => throw new IllegalArgumentException(
          s"expected Rows at position $i, got ${other.getClass.getSimpleName}")
      }
      i += 1
      var click = Option.empty[ClickBtn]
      var save = Option.empty[SavePartial]
      var search = Option.empty[Search]
      var blockDone = false
      while (i < raw.length && !blockDone) raw(i) match {
        case _: Rows => blockDone = true
        case c: ClickBtn => click = Some(c); i += 1
        case s: SavePartial => save = Some(s); i += 1
        case s: Search => search = Some(s); i += 1
      }
      result += MefStep(rows,
        click.getOrElse(throw new IllegalArgumentException(
          s"block with Rows(${rows.rows.mkString(",")}) has no ClickBtn")),
        save, search)
    }
    result.result()
  }

  /** Lower a parsed workflow onto the declarative drill model: block k's
    * click names level k's column, and block k+1's `Rows` filter the values
    * VISIBLE AFTER that click — i.e. level k's values. The first block's
    * `Rows` address the landing pseudo-table (the "total" row) and have no
    * fact column; the last level is unfiltered. `asColumn = false` clicks
    * are navigation-only and contribute no drill column. */
  def toDrillSteps(steps: Seq[MefStep]): Seq[DrillStep] =
    steps.zipWithIndex.collect { case (s, i) if s.click.asColumn =>
      val filt = steps.lift(i + 1).map(_.rows.rows).getOrElse(Nil)
      DrillStep(s.click.name, Some(filt.mkString("|")).filter(_.nonEmpty))
    }

  /** The Search token as a pushdown-able predicate over the level table:
    * `description` lowers to a contains, `code` to exact equality — the two
    * shapes [[graft.sources.PagedSource]]'s scan builder delegates to the
    * remote panel once the level's row count crosses the 400-row threshold
    * (`SearchablePageFetcher`; reference `perustats/MEF/scrapper.py:100-127`).
    * Below the threshold the predicate simply evaluates Spark-side — same
    * results, no panel round-trip, exactly the reference's rule. */
  def searchPredicate(search: Search, descCol: String,
      codeCol: String): Column =
    search.method match {
      case "code" => col(codeCol) === search.query
      case _ => col(descCol).contains(search.query)
    }

  /** Execute a parsed workflow as ONE declarative plan over the ingested
    * fact table: apply every block's row filter at its level, then group by
    * the click columns and sum the measures (exact DECIMAL sums, the
    * [[MEFDrilldown.run]] contract). */
  def run(fact: DataFrame, steps: Seq[MefStep],
      measures: Seq[String]): DataFrame =
    MEFDrilldown.run(fact, toDrillSteps(steps), measures)
}
