package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern scrub — the PII-redaction pass every shipped training corpus
  * runs before tokenization (emails, phone numbers, IP addresses → typed
  * placeholder tokens), generalized to an ordered rule list.
  *
  * Shape: entirely codegen'd `regexp_count`/`regexp_replace` expressions —
  * one narrow projection, no UDF, no shuffle; at 100 TB this is a pure
  * map-side pass that pipelines into whatever scan/write surrounds it.
  * Counts are detections on the ORIGINAL text per rule (independent,
  * well-defined under overlapping rules); the rewrite applies the rules
  * in order, each over the previous rule's output.
  *
  * Regexes must stay inside the Java-regex ∩ RE2 common subset
  * (character classes, bounded quantifiers, `\b`, `\d`, alternation — no
  * lookaround, no backreferences) so the DuckDB oracle replays them
  * exactly; the shipped [[Email]]/[[Ipv4]]/[[Phone]] rules do.
  */
object Scrub {

  /** One scrub rule: `name` labels the count column (`n_<name>`),
    * `pattern` is a Java/RE2-common regex, `replacement` the placeholder
    * written over each match. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val Email: Rule =
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val Ipv4: Rule =
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  val Phone: Rule =
    Rule("phone", "\\+?\\d[\\d -]{7,}\\d", "<PHONE>")

  /** Per-document scrub report: the id column, one `n_<rule>` detection
    * count per rule, and the rewritten text as `clean_text`. */
  def scrub(
      docs: DataFrame,
      rules: Seq[Rule],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(rules.nonEmpty, "at least one scrub rule")
    val counts: Seq[Column] = rules.map(r =>
      regexp_count(col(textCol), lit(r.pattern)).cast("long").as(s"n_${r.name}"))
    val cleaned = rules.foldLeft(col(textCol)) { (c, r) =>
      regexp_replace(c, r.pattern, r.replacement)
    }
    docs.select(col(idCol) +: counts :+ cleaned.as("clean_text"): _*)
  }
}
