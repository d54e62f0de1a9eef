package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Frequency-aware date parsing / formatting (SURVEY §2.7 F7–F9).
  *
  * The reference parses BCRP API date labels per frequency
  * (`perustats/BCRP/utils.py:147-200`, formats at
  * `perustats/BCRP/models.py:43-48`): D = "15.Ene.23", M = "Ene.2023",
  * A = "2023", Q = "Q1.23" (quarter label -> end-of-quarter date + a "yq"
  * string column), with Spanish month abbreviations mapped to English first
  * (`perustats/BCRP/utils.py:138-140`). Everything below is a composition of
  * codegen'd built-ins returning `Column` — no UDFs.
  */
object dates {

  private val monthMap: Seq[(String, String)] = Seq(
    "Ene" -> "Jan", "Feb" -> "Feb", "Mar" -> "Mar", "Abr" -> "Apr",
    "May" -> "May", "Jun" -> "Jun", "Jul" -> "Jul", "Ago" -> "Aug",
    "Set" -> "Sep", "Sep" -> "Sep", "Oct" -> "Oct", "Nov" -> "Nov",
    "Dic" -> "Dec")

  /** F7: rewrite Spanish month abbreviations to English (case-insensitive). */
  def spanishMonthsToEnglish(c: Column): Column =
    monthMap.foldLeft(c) { case (col, (es, en)) =>
      regexp_replace(col, "(?i)" + es, en)
    }

  /** F8: parse a BCRP date label for the given frequency into a DateType.
    * M/A labels resolve to the FIRST day of the period (pandas `to_datetime`
    * with "%b.%Y"/"%Y"), Q labels to the END of the quarter (pandas
    * `Period.to_timestamp(how="end")`); two-digit years pivot into 20xx.
    */
  def bcrpDate(freq: String, c: Column): Column = freq match {
    case "D" =>
      // pandas "%d.%b.%y" pivots two-digit years at 69 ("99" -> 1999,
      // "68" -> 2068); Spark's `yy` would put everything in 20xx, so the
      // year is rebuilt explicitly to match the reference.
      val en = spanishMonthsToEnglish(c)
      val yy = regexp_extract(en, "\\.(\\d{2})$", 1).cast("int")
      val year = when(yy >= 69, yy + 1900).otherwise(yy + 2000)
      to_date(concat(regexp_extract(en, "^(\\d{1,2}\\.[A-Za-z]{3})\\.", 1),
        lit("."), year.cast("string")), "dd.MMM.yyyy")
    case "M" => to_date(spanishMonthsToEnglish(c), "MMM.yyyy")
    case "A" => to_date(c, "yyyy")
    case "Q" =>
      // Same 69-pivot as the D path: pandas `Period("Q4.99")` resolves to
      // 1999Q4, and BCRP quarterly series reach back into the 1990s.
      val q = regexp_extract(c, "(?i)Q(\\d)\\.(\\d{2})", 1).cast("int")
      val yy = regexp_extract(c, "(?i)Q(\\d)\\.(\\d{2})", 2).cast("int")
      val y = when(yy >= 69, yy + 1900).otherwise(yy + 2000)
      last_day(make_date(y, q * lit(3), lit(1)))
    case other => throw new IllegalArgumentException(s"unknown frequency: $other")
  }

  /** Quarter label column ("2023Q1") accompanying Q-frequency dates.
    * Reference keeps a string `yq` column (`perustats/BCRP/utils.py:176-184`). */
  def yqLabel(dateCol: Column): Column =
    concat(year(dateCol).cast("string"), lit("Q"), quarter(dateCol).cast("string"))

  /** F9: render a date in the BCRP API request format for a frequency:
    * D -> "2023-06-15", M -> "2023-6", Q -> "2023-2", A -> "2023".
    * Reference `perustats/BCRP/models.py:89-131`. */
  def apiDateFormat(freq: String, c: Column): Column = freq match {
    case "D" => date_format(c, "yyyy-MM-dd")
    case "M" => concat(year(c).cast("string"), lit("-"), month(c).cast("string"))
    case "Q" => concat(year(c).cast("string"), lit("-"), quarter(c).cast("string"))
    case "A" => year(c).cast("string")
    case other => throw new IllegalArgumentException(s"unknown frequency: $other")
  }
}
