package graft.model

/** Typed request/config models (SURVEY §1.1): Scala case-class equivalents of
  * the reference's dataclasses, used by the pipeline layer and as
  * `Dataset[T]` element types where type safety helps.
  */

/** Series frequency. Reference `perustats/BCRP/models.py:71-76`. */
sealed abstract class Frequency(val code: String)
object Frequency {
  case object Daily extends Frequency("D")
  case object Monthly extends Frequency("M")
  case object Quarterly extends Frequency("Q")
  case object Annual extends Frequency("A")
  val all: Seq[Frequency] = Seq(Daily, Monthly, Quarterly, Annual)
  def of(c: String): Frequency = all.find(_.code == c.toUpperCase)
    .getOrElse(throw new IllegalArgumentException(s"unknown frequency: $c"))
}

/** A BCRP series request: codes grouped by their frequency suffix (last
  * character of the code), with a shared date range. Reference
  * `perustats/BCRP/models.py:134-172` (`__post_init__` normalization:
  * uppercase + trim, group by last char). */
final case class SeriesQuery(codes: Seq[String], start: String, end: String) {
  val normalized: Seq[String] = codes.map(_.trim.toUpperCase).distinct
  val byFrequency: Map[String, Seq[String]] =
    normalized.groupBy(c => c.takeRight(1))
}

/** One row of the BCRP series catalog (fixture A1 in FIXTURES.md).
  * Reference `perustats/BCRP/metadata.py:73-84,136-139`. */
final case class CatalogRow(code: String, description: String, freq: String,
    group: String, lastUpdate: String)

/** One INEI survey-module row with its progress flags (fixture A4).
  * Reference `perustats/inei/utils/db_utils.py:16-44`. */
final case class ModuleRow(survey: String, year: Int, periodo: String,
    moduleCode: String, url: Option[String], downloaded: Boolean,
    unzipped: Boolean, organized: Boolean)

/** One extracted file as seen by the INEI organizer (path metadata only —
  * content stays on disk). Reference `perustats/inei/organizer.py:98-193`. */
final case class ExtractedFile(year: Int, moduleCode: String, folder: String,
    fileName: String, sizeBytes: Long, sha256: String)

/** One step of a MEF drill-down workflow: an optional row filter (regex
  * alternatives over the level's label column) and the next level to expand.
  * Reference `perustats/MEF/steps/workflow.py:9-16` (Step = rows/click) —
  * re-expressed declaratively: a step IS a (filter, groupBy-dimension) pair
  * over the ingested fact table (SURVEY §3.3). */
final case class DrillStep(level: String, keepMatching: Option[String] = None)

/** MEF workflow TOKENS — the little query IR a user writes flat and the
  * engine parses into [[MefStep]] blocks
  * ([[graft.pipelines.MEFWorkflow.parse]]). Reference
  * `perustats/MEF/steps/click.py:16-67` (the Rows / ClickBtn / SavePartial /
  * Search dataclasses). */
sealed trait MefToken
object MefToken {

  /** Row filter over the visible level table: keep rows containing ANY of
    * the regex alternatives; empty = keep (and iterate) every row.
    * Reference `click.py:16-23`. */
  final case class Rows(rows: Seq[String] = Nil) extends MefToken

  /** Button click expanding the next drill level; `name` (the metadata /
    * drill column the click contributes) derives from the control id's
    * `Btn` suffix. Reference `click.py:27-45`. */
  final case class ClickBtn(button: String, asColumn: Boolean = true)
      extends MefToken {
    // substring after the LAST "Btn", exactly Python's split("Btn")[-1]:
    // a trailing-"Btn" id yields "" (Scala's split drops trailing empties
    // and would silently return the PREFIX instead).
    val name: String =
      if (button.contains("Btn"))
        button.substring(button.lastIndexOf("Btn") + 3)
      else button
  }

  /** Progress-checkpoint marker: from this block on, partial results are
    * persisted per iterated row (resume point when the remote service
    * drops). Reference `click.py:49-56`. */
  final case class SavePartial(filenamePrefix: Option[String] = None)
      extends MefToken

  /** Remote search-panel query — the panel the MEF UI shows once a level
    * exceeds ~400 rows: `description` searches by contains, `code` by exact
    * match. Reference `click.py:59-67`. */
  final case class Search(query: String, method: String = "description")
      extends MefToken
}

/** One parsed MEF workflow block: the row filter in force, the click that
  * expands the next level, and the optional save / search actions.
  * Reference `perustats/MEF/steps/workflow.py:9-16`. */
final case class MefStep(rows: MefToken.Rows, click: MefToken.ClickBtn,
    save: Option[MefToken.SavePartial] = None,
    search: Option[MefToken.Search] = None)
