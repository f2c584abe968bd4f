package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction over the documents table — the scrub a corpus goes
  * through before training: emails, phone numbers and IPv4 addresses are
  * replaced with typed placeholder tokens, and per-document match counts
  * are kept for auditing.
  *
  * Shuffle-free per-row work (regexp_count / regexp_replace are codegen'd
  * built-ins), linear in input splits.
  *
  * Cross-engine exactness: patterns are restricted to a dialect Java
  * (backtracking, leftmost-first) and RE2 (leftmost-longest) interpret
  * identically — character classes and greedy bounded quantifiers only, NO
  * alternation (where the two matching disciplines diverge). Counts are
  * taken on the original text; replacements apply email → phone → ip, so
  * the oracle mirrors the exact sequence.
  */
object Redact {
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** doc_id, per-type match counts, has_pii, and the md5 of the redacted
    * text (compact proof the replacement text is identical cross-engine
    * without shipping the full corpus through the result).
    */
  def piiScrub(documents: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"),
        Ipv4Pattern, "<IP>")
    documents
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailPattern)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(PhonePattern)).cast("long").as("n_phones"),
        regexp_count(col("text"), lit(Ipv4Pattern)).cast("long").as("n_ips"),
        md5(redacted).as("clean_md5"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ips") > 0)
      .orderBy("doc_id")
  }

  def piiScrubSql: String = {
    def d(p: String) = p // DuckDB standard strings don't process backslashes
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${d(EmailPattern)}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '${d(PhonePattern)}')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '${d(Ipv4Pattern)}')) AS BIGINT) AS n_ips,
       |  md5(regexp_replace(
       |        regexp_replace(
       |          regexp_replace(text, '${d(EmailPattern)}', '<EMAIL>', 'g'),
       |          '${d(PhonePattern)}', '<PHONE>', 'g'),
       |        '${d(Ipv4Pattern)}', '<IP>', 'g')) AS clean_md5,
       |  (len(regexp_extract_all(text, '${d(EmailPattern)}'))
       |   + len(regexp_extract_all(text, '${d(PhonePattern)}'))
       |   + len(regexp_extract_all(text, '${d(Ipv4Pattern)}'))) > 0 AS has_pii
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
