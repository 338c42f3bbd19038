package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for pretraining corpora: detect + redact emails, IPv4
  * addresses, and international-format phone numbers with typed
  * placeholder tokens. Map-only over the text column — the regexes run
  * inside whole-stage codegen (`regexp_replace`/`regexp_count` are native
  * expressions), no shuffle, no UDF; at 100 TB this is a pure scan op
  * whose cost is the regex automata, which is why the patterns below are
  * kept backtracking-free (no nested quantifiers, no alternation over
  * overlapping prefixes — they compile to near-linear scans in both
  * java.util.regex and RE2, and behave IDENTICALLY in both, which the
  * DuckDB oracle re-proves on every run).
  *
  * Redaction order matters and is fixed: emails first (their local/domain
  * parts can contain digit runs an IP or phone pattern could nibble at),
  * then IPs, then phones — each later pattern sees the earlier
  * placeholders, which contain no pattern-matchable characters.
  *
  * The reference has no PII surface (its corpora are numeric vectors);
  * this is north-star pipeline tooling, same tier as the dedup family.
  */
object Pii {

  /** user@host.tld — conservative: requires a dotted TLD of letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Dotted quad. The \\b guards only block digit-ADJACENT runs (a1.2.3.4,
    * 1.2.3.4567); a longer dotted run like 1.2.3.4.5 still matches its
    * first four octets ('.'-adjacency IS a word boundary) — PiiSpec pins
    * that behavior deliberately, and the boundary semantics are the same
    * in java.util.regex and RE2 (the parity the oracle gates).
    */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** +CC NNN NNNN… — international format with space separators. */
  val PhoneRe = "\\+[0-9]{1,3} [0-9]{3} [0-9]{4,6}"

  val EmailTag = "[EMAIL]"
  val IpTag    = "[IP]"
  val PhoneTag = "[PHONE]"

  /** The scrubbed text: all three classes replaced by their tags. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** Per-class match counts (BEFORE redaction) — the audit trail a
    * compliance pass wants next to the scrub itself.
    */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipCount(text: Column): Column    = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  // ---- DuckDB oracle mirrors (RE2 dialect; same pattern strings) ----

  private def sqlQuote(re: String): String = "'" + re.replace("'", "''") + "'"

  def redactSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($expr, " +
      s"${sqlQuote(EmailRe)}, '$EmailTag', 'g'), " +
      s"${sqlQuote(Ipv4Re)}, '$IpTag', 'g'), " +
      s"${sqlQuote(PhoneRe)}, '$PhoneTag', 'g')"

  def countSql(expr: String, re: String): String =
    s"cast(len(regexp_extract_all($expr, ${sqlQuote(re)})) as bigint)"
}
