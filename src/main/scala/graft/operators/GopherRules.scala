package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models", App. A1.1) — the published rule battery real curation pipelines
  * run before training, as one shuffle-free per-row projection.
  *
  * Every rule is evaluated in INTEGER arithmetic (`10*nsym <= nwords`
  * instead of `nsym/nwords <= 0.1`), so the bits are exact, cross-engine
  * reproducible, and never subject to float rounding at a threshold. The
  * counts come from single-pass regexp kernels (codegen'd, no UDF, no
  * intermediate token arrays except the distinct-stop-word set), so at
  * 100 TB this is an embarrassingly parallel map over the document scan.
  *
  * Thresholds follow the paper: 50..100k words, mean word length 3..10,
  * symbol-to-word ratio <= 0.1 (# and ellipsis), >= 90% of lines not
  * starting with a bullet, <= 30% of lines ending in an ellipsis, >= 80%
  * of words containing an alphabetic character, and >= 2 distinct English
  * stop words from {the, be, to, of, and, that, have, with}.
  */
object GopherRules {

  /** The paper's English stop set. The list is the per-language knob of
    * the rule battery — pipelines localize it; the thresholds stay. */
  val DefaultStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def stopRe(stopWords: Seq[String]): String =
    s"\\b(${stopWords.mkString("|")})\\b"

  /** Per-document integer stats the rules derive from. ASCII-only regex
    * classes: identical semantics under Java regex and RE2, so a SQL
    * oracle can replay them verbatim. */
  def stats(text: Column,
      stopWords: Seq[String] = DefaultStopWords): Seq[(String, Column)] = Seq(
    "nwords" -> regexp_count(text, lit("\\S+")).cast("long"),
    "wchars" -> length(regexp_replace(text, "\\s", "")).cast("long"),
    "nsym" -> regexp_count(text, lit("#|\\.\\.\\.")).cast("long"),
    "nlines" -> size(split(text, "\n")).cast("long"),
    "nbullet" -> regexp_count(text, lit("(?m)^[ \\t]*[-*]")).cast("long"),
    "nellend" -> regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("long"),
    "nalpha" -> regexp_count(text, lit("\\S*[A-Za-z]\\S*")).cast("long"),
    "nstop" -> size(array_distinct(regexp_extract_all(lower(text),
      lit(stopRe(stopWords)), lit(1)))).cast("long"))

  /** (doc_id, n_words, r_* bits, keep) — one 0/1 BIGINT column per rule so
    * downstream can report per-rule rejection rates with one aggregate. */
  def ruleBits(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      stopWords: Seq[String] = DefaultStopWords): DataFrame = {
    val st = docs.select(col(idCol) +: stats(col(textCol), stopWords).map {
      case (n, c) => c.as(n)
    }: _*)
    def bit(c: Column) = c.cast("long")
    val nwords = col("nwords")
    val rules = Seq(
      "r_wc" -> (nwords >= 50 && nwords <= 100000L),
      "r_wlen" -> (lit(3) * nwords <= col("wchars") &&
        col("wchars") <= lit(10) * nwords),
      "r_sym" -> (lit(10) * col("nsym") <= nwords),
      "r_bullet" -> (lit(10) * col("nbullet") <= col("nlines")),
      "r_ell" -> (lit(10) * col("nellend") <= lit(3) * col("nlines")),
      "r_alpha" -> (lit(5) * col("nalpha") >= lit(4) * nwords),
      "r_stop" -> (col("nstop") >= 2))
    st.select(
      col(idCol) +: nwords.as("n_words") +:
        (rules.map { case (n, c) => bit(c).as(n) } :+
          bit(rules.map(_._2).reduce(_ && _)).as("keep")): _*)
  }

  /** The same stats in DuckDB SQL, for oracle construction. */
  def statsSql(stopWords: Seq[String] = DefaultStopWords): Seq[(String, String)] = Seq(
    "nwords" -> """CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)""",
    "wchars" -> """CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)""",
    "nsym" -> """CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)""",
    "nlines" -> """CAST(len(string_split(text, chr(10))) AS BIGINT)""",
    "nbullet" -> """CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*]')) AS BIGINT)""",
    "nellend" -> """CAST(len(regexp_extract_all(text, '(?m)\.\.\.$')) AS BIGINT)""",
    "nalpha" -> """CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT)""",
    "nstop" -> ("CAST(len(list_distinct(regexp_extract_all(lower(text), " +
      s"'${stopRe(stopWords)}', 1))) AS BIGINT)"))

  /** Full oracle SQL over a `documents(doc_id, text)` table. */
  def oracleSql(stopWords: Seq[String] = DefaultStopWords): String = {
    val st = statsSql(stopWords).map { case (n, e) => s"$e $n" }.mkString(",\n       ")
    val bits = Seq(
      "r_wc" -> "nwords >= 50 AND nwords <= 100000",
      "r_wlen" -> "3 * nwords <= wchars AND wchars <= 10 * nwords",
      "r_sym" -> "10 * nsym <= nwords",
      "r_bullet" -> "10 * nbullet <= nlines",
      "r_ell" -> "10 * nellend <= 3 * nlines",
      "r_alpha" -> "5 * nalpha >= 4 * nwords",
      "r_stop" -> "nstop >= 2")
    val bitCols = bits.map { case (n, e) => s"CAST($e AS BIGINT) $n" }
      .mkString(",\n       ")
    val keep = bits.map { case (_, e) => s"($e)" }.mkString(" AND ")
    s"""WITH s AS (
       |  SELECT doc_id,
       |       $st
       |  FROM documents)
       |SELECT doc_id, nwords AS n_words,
       |       $bitCols,
       |       CAST($keep AS BIGINT) keep
       |FROM s ORDER BY doc_id""".stripMargin
  }
}
