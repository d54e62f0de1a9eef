package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric coercion column functions (SURVEY §2.7 F10–F12). */
object numeric {

  /** F10: lenient numeric parse — strips thousands separators and a trailing
    * percent sign, then try-casts to double (null on garbage). Matches the
    * reference's `pd.to_numeric(errors="coerce")` after separator cleanup
    * (`perustats/MEF/utils/tables.py:59-65`, `perustats/infogob/utils.py:1-14`).
    */
  def tryNumeric(c: Column): Column =
    try_cast(regexp_replace(trim(c), "[,%]", ""), "double")

  /** F11: first non-null by explicit preference order.
    * Reference `perustats/inei/fetcher.py:136-137`. */
  def coalescePreferred(cols: Column*): Column = coalesce(cols: _*)

  /** F10 (MEF-exact variant): convert ONLY strings shaped like guarded
    * grouped numbers (`^[\d,]+\.?\d*$`); anything else stays null — the
    * reference's regex gate keeps "7%" or "1.2.3" as text
    * (`perustats/MEF/utils/tables.py:59-65`). */
  def mefNumeric(c: Column): Column =
    when(c.rlike("^[\\d,]+\\.?\\d*$"),
      regexp_replace(c, ",", "").cast("double"))

  private def try_cast(c: Column, t: String): Column =
    c.try_cast(t)
}
