package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — detection counts and redaction
  * (the standard pre-training privacy pass: emails, phone numbers, IP
  * addresses, SSN-shaped ids are masked before a corpus is shipped).
  * No reference equivalent (pgloader is pure ETL) — extension surface.
  *
  * All pure `Column` expressions (`regexp_extract_all` / chained
  * `regexp_replace`): one narrow codegen'd projection per document, no
  * shuffle, scales linearly with corpus bytes. Patterns stay within the
  * regex subset shared by Java's engine and RE2 (no lookbehind), so the
  * same rules run on any engine the corpus pipeline touches.
  */
object Scrub {

  /** One PII category: a detection regex and its mask token. Order
    * matters when categories overlap — [[piiRules]] is applied
    * email-first so the digits inside a mailbox name are never
    * re-matched as a phone number. */
  final case class PiiRule(name: String, regex: String, mask: String)

  /** The default rule set, in application order. */
  val piiRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    // SSN before phone: 3-2-4 digit groups are a strict subset of what a
    // sloppier phone pattern could swallow
    PiiRule("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    PiiRule("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    PiiRule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
      "<IP>"))

  /** Number of matches of `rule` in `text`. */
  def piiCount(text: Column, rule: PiiRule): Column =
    size(regexp_extract_all(text, lit(rule.regex), lit(0)))

  /** `text` with every rule's matches replaced by its mask token,
    * applied in [[piiRules]] order. */
  def redact(text: Column, rules: Seq[PiiRule] = piiRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, lit(r.regex),
      lit(r.mask)))
}
