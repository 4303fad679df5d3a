package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace personally
  * identifiable spans with typed placeholder tokens (the standard
  * pre-training scrub — e.g. what C4/Dolma-style pipelines do before
  * tokenization) and count what was removed per category.
  *
  * Pure codegen'd string expressions (`regexp_replace`/`regexp_count`) —
  * narrow, zero shuffles, scales linearly with the scan. Patterns avoid
  * alternation-at-same-start and backtracking-sensitive constructs so
  * Java regex (Spark) and RE2 (DuckDB oracle) agree exactly.
  *
  * Categories apply in a fixed order (email, card, ssn, phone, ip) so
  * overlapping digit runs are claimed deterministically — a card number is
  * never half-eaten by the phone pattern.
  */
object Pii {

  /** (category, placeholder, regex) in application order. */
  val categories: Seq[(String, String, String)] = Seq(
    ("email", "<EMAIL>", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("card", "<CARD>", "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"),
    ("ssn", "<SSN>", "\\b\\d{3}-\\d{2}-\\d{4}\\b"),
    ("phone", "<PHONE>", "\\(\\d{3}\\) \\d{3}-\\d{4}"),
    ("ip", "<IP>", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"))

  /** Redact `textCol` in place and add one `n_<category>` count column per
    * category (counted on the text as it stood when that category was
    * applied, i.e. after earlier categories were already redacted). */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame =
    categories.foldLeft(df) { case (acc, (name, token, re)) =>
      acc
        .withColumn(s"n_$name", regexp_count(col(textCol), lit(re)))
        .withColumn(textCol, regexp_replace(col(textCol), re, token))
    }

  /** Just the redacted text as a Column (for composing into pipelines). */
  def redactText(text: Column): Column =
    categories.foldLeft(text) { case (acc, (_, token, re)) =>
      regexp_replace(acc, re, token)
    }
}
