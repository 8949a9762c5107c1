package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the compliance half of a
  * training-data curation pipeline (scan for leaked contact data, count it
  * per source, scrub it before packing).
  *
  * Detection is regex-per-category, evaluated as codegen'd
  * `regexp_extract_all` projections — per-row work, no shuffle, no UDF.
  * The patterns deliberately stay inside the common subset of Java regex
  * (Spark) and RE2 (DuckDB, Go, Rust `regex`): character classes, bounded
  * repetition, and `\b` word boundaries only — no backreferences or
  * lookaround — so a DuckDB oracle replays every count bit-for-bit and the
  * same patterns port to sibling scrubbing jobs unchanged.
  *
  * Scale shape: embarrassingly parallel map over the corpus; the per-source
  * rollup is one map-side-combining HashAggregate. At 100 TB the scan cost
  * is the read itself.
  */
object PiiScan {

  /** Category name → pattern. Order is the column order of [[scan]]. */
  val Patterns: Seq[(String, String)] = Seq(
    "emails" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ips" -> "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phones" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Per-document match counts: adds one `<category>` BIGINT column per
    * pattern plus `pii_total`. */
  def scan(df: DataFrame, textCol: String): DataFrame = {
    val counted = Patterns.foldLeft(df) { case (acc, (name, pat)) =>
      acc.withColumn(name, countMatches(col(textCol), pat).cast("long"))
    }
    counted.withColumn("pii_total",
      Patterns.map(p => col(p._1)).reduce(_ + _))
  }

  /** Replace every match of every category with `[<CATEGORY>]`. Applied in
    * [[Patterns]] order, so an IP inside an already-redacted email cannot
    * double-fire. */
  def redact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, Patterns.foldLeft(col(textCol)) {
      case (c, (name, pat)) =>
        regexp_replace(c, pat, s"[${name.dropRight(1).toUpperCase}]")
    })
}
