package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization column functions (SURVEY §2.7, F1–F6, F13–F18).
  * All are pure `Column => Column` compositions of codegen'd built-ins —
  * no UDFs — so Catalyst can constant-fold / push them down freely.
  */
object text {

  /** F1: collapse internal whitespace runs to one space and trim.
    * Reference `perustats/BCRP/metadata.py:49-53` (semantics only). */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F2: canonical code form — uppercase + trim.
    * Reference `perustats/BCRP/models.py:155-157`. */
  def normalizeCode(c: Column): Column = upper(trim(c))

  /** F1 (BCRP-exact variant): whitespace collapse + strip the trailing
    * "- (N series)" catalog suffix. Reference `_clean_text`,
    * `perustats/BCRP/metadata.py:49-53`. */
  def cleanSeriesDescription(c: Column): Column =
    trim(regexp_replace(normalizeWhitespace(c),
      "\\s*-\\s*\\(\\d+ series\\).*$", ""))

  /** P2 (reference-exact): case-insensitive contains-any-of, with the
    * alternatives regex-ESCAPED (literal match, like the reference's
    * `"|".join(map(re.escape, rows))`, `perustats/MEF/utils/tables.py:9-17`).
    */
  def containsAnyLiteral(c: Column, literals: Seq[String]): Column =
    c.rlike(literals.map(java.util.regex.Pattern.quote)
      .mkString("(?i)", "|", ""))

  /** F4: zero-pad a code to `n` digits. Reference `perustats/inei/fetcher.py:134`. */
  def zeroPad(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")

  /** F6: filename sanitizer — non [alnum space dash underscore] -> "_".
    * Reference `perustats/MEF/utils/parse_file.py:8-21`. */
  def sanitizeFilename(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9 _-]", "_")

  /** F18: first integer substring, as long (null when absent).
    * Reference `perustats/MTC/homologacion.py:43-45`. */
  def extractInt(c: Column): Column =
    nullif(regexp_extract(c, "\\d+", 0), lit("")).cast("long")

  /** F5: unicode slugify via the custom codegen'd expression. */
  def slugify(c: Column): Column = expressions.slugify(c)

  /** Accent strip via the custom codegen'd expression. */
  def stripAccents(c: Column): Column = expressions.stripAccents(c)

  /** Deterministic document fingerprint (rolling polynomial hash mod 1e9+7). */
  def fingerprint(c: Column): Column = expressions.rollingHash(c)
}
