package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data curation (north-star
  * extension — the standard pre-training scrub pass: find and mask emails,
  * IPv4 addresses and phone numbers before a corpus ships).
  *
  * The patterns are deliberately RE2-compatible (no backreferences or
  * lookaround) so the SAME literal pattern runs under Spark's Java regex
  * and DuckDB's RE2 — each builder has an `sql*` twin generated from the
  * same constants, so the two engines cannot drift. Everything is
  * codegen'd `regexp_*` built-ins over columns: the scrub is a pure map,
  * scales linearly with the scan, and needs no shuffle.
  */
object pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** (kind, pattern, replacement) in redaction order: emails first (their
    * local/domain parts contain dotted digit runs the IP pattern could
    * otherwise claim), then IPs, then phones. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Number of matches of one pattern in the column. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** All three PII kinds masked with their replacement tags. */
  def redact(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** DuckDB twin of [[matchCount]]. */
  def sqlMatchCount(e: String, pattern: String): String =
    s"len(regexp_extract_all($e, '$pattern'))"

  /** DuckDB twin of [[redact]] (RE2 needs the explicit 'g' flag). */
  def sqlRedact(e: String): String =
    Patterns.foldLeft(e) { case (acc, (_, re, tag)) =>
      s"regexp_replace($acc, '$re', '$tag', 'g')"
    }
}
