package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.functions.TextOps

/** Pins the [[graft.functions.WordShingles]] codegen kernel to the composed
  * built-in form it replaced (split + transform + concat_ws + array_distinct)
  * — element-for-element, order included. Equality here on the REAL corpus is
  * what makes the kernel swap oracle-safe: the composed form is the one the
  * DuckDB oracle was originally verified against. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The original HOF formulation of NearDup.shingles. */
  private def composed(df: DataFrame, textCol: String, n: Int): org.apache.spark.sql.Column = {
    val ws = split(lower(col(textCol)), "\\s+")
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  private def assertEqualOn(df: DataFrame, textCol: String, n: Int): Unit = {
    TextOps.register(df.sparkSession)
    val diff = df.select(
        composed(df, textCol, n).as("a"),
        TextOps.shinglesCol(col(textCol), lit(n)).as("b"))
      .where(not(col("a") <=> col("b")))
    assert(diff.count() === 0L)
  }

  test("word_shingles equals the composed HOF form on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assertEqualOn(docs, "text", 3)
    assertEqualOn(docs, "text", 2)
  }

  test("word_shingles edge cases: whitespace runs, short docs, repeats, unicode, null") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox",
      "  leading and   multiple   spaces  ",
      "one two",            // fewer than 3 tokens -> empty
      "one",                // single token
      "",                   // empty string
      "a b a b a b a b",    // repeated shingles -> distinct
      "Tabs\tand\nnewlines separate tokens too",
      "ünïcode Towers ÉÉ ss ß mixed CASE words",
      null.asInstanceOf[String]
    ).toDF("text")
    assertEqualOn(df.where(col("text").isNotNull), "text", 3)
    // null text: composed form yields empty array (size(null)=-1), kernel null
    // -> both are dropped identically by the explode that always follows
    TextOps.register(spark)
    val fromNull = df.where(col("text").isNull)
      .select(explode(TextOps.shinglesCol(col("text"), lit(3))))
    assert(fromNull.count() === 0L)
  }

  test("word_shingles produces the expected shingles in first-occurrence order") {
    import spark.implicits._
    TextOps.register(spark)
    val out = Seq("B b a B b a x").toDF("text")
      .select(TextOps.shinglesCol(col("text"), lit(3)).as("g"))
      .head().getSeq[String](0)
    assert(out === Seq("b b a", "b a b", "a b b", "b a x"))
  }
}
