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

  private def h56(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  test("h56 kernel equals the md5-hex/conv column form on corpus shingles") {
    TextOps.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val g = graft.operators.NearDup.shingles(docs, "doc_id", "text")
    assert(g.where(TextOps.h56Col(col("g")) =!= h56(col("g"))).count() === 0L)
    // and on raw text incl. unicode
    assert(docs.where(TextOps.h56Col(col("text")) =!= h56(col("text"))).count() === 0L)
  }

  test("simhash56 kernel equals the explode + 56-column ±1 aggregate form") {
    TextOps.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(lower(col("text")), "\\s+"))).as("w"))
      .withColumn("h", h56(col("w")))
    def bitSum(j: Int) =
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    val bitSums = tok.groupBy(col("doc_id")).agg(bitSum(0), (1 until 56).map(bitSum): _*)
    val agg = bitSums.select(col("doc_id"), (0 until 56).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("simhash"))
    val kern = docs.select(col("doc_id"),
      TextOps.simhash56Col(split(lower(col("text")), "\\s+")).as("simhash"))
    assert(kern.join(agg, "doc_id")
      .where(kern("simhash") =!= agg("simhash")).count() === 0L)
    assert(kern.count() === agg.count())
  }

  test("minhash16 kernel equals the 16-column min aggregate over hashed shingles") {
    TextOps.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val P = 1000000007L
    val ex = graft.operators.NearDup.shingles(docs, "doc_id", "text")
      .withColumn("hp", h56(col("g")) % P)
    def mh(j: Int) = min((lit(37L + 101L * j) * col("hp") + lit(17L + 13L * j)) % P).as(s"m$j")
    val agg = ex.groupBy(col("doc_id")).agg(mh(0), (1 until 16).map(mh): _*)
      .select(col("doc_id"), array((0 until 16).map(j => col(s"m$j")): _*).as("mh"))
    val kern = docs.select(col("doc_id"),
      TextOps.minhash16Col(TextOps.shinglesCol(col("text"), lit(3))).as("mh"))
      .where(col("mh").isNotNull)
    assert(kern.join(agg, "doc_id").where(kern("mh") =!= agg("mh")).count() === 0L)
    assert(kern.count() === agg.count())
  }

  test("winnow56 kernel equals the window-function winnowing formulation") {
    import org.apache.spark.sql.expressions.Window
    TextOps.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val w = 5
    val ws = split(lower(col("text")), "\\s+")
    val tok = docs.where(size(ws) >= 3)
      .select(col("doc_id"), posexplode(ws).as(Seq("i", "w")))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val grams = tok
      .withColumn("g", concat(col("w"), lit(" "), lead(col("w"), 1).over(byPos),
        lit(" "), lead(col("w"), 2).over(byPos)))
      .where(col("g").isNotNull)
      .select(col("doc_id"), col("i"), h56(col("g")).as("h"))
    val win = grams
      .withColumn("fp", min(col("h")).over(byPos.rowsBetween(0, w - 1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .where(col("i") <= col("n") - w)
      .select(col("doc_id"), col("fp")).distinct()
    val kern = docs.select(col("doc_id"),
      explode(TextOps.winnow56Col(TextOps.gramsCol(col("text"), lit(3)), lit(w))).as("fp"))
    assert(kern.count() === win.count())
    assert(kern.except(win).count() === 0L)
    assert(win.except(kern).count() === 0L)
  }
}
