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
