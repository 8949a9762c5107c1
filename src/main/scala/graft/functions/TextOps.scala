package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` → array<string>: distinct word n-gram shingles
  * of lower(text), tokens split on `\s+`, joined with a single space.
  *
  * Exactly replicates the composed built-in form
  * `array_distinct(transform(sequence(0, size(ws)-n),
  *   i -> concat_ws(' ', ws[i+1] … ws[i+n])))` over
  * `ws = split(lower(text), '\s+')` — same UTF8String lowercase, the same
  * regex split (Spark's own `UTF8String.split`, trailing empties kept), the
  * same byte-equality distinct keeping first occurrence — but in ONE pass
  * without per-element interpreted-lambda dispatch (the HOF chain evaluates
  * `concat_ws`+`element_at` per shingle per token interpreted; observed as
  * the dominant cost of building the near-dup inverted index, q46/q47).
  * Rows with fewer than n tokens yield an EMPTY array (the composed form
  * filtered them before transform; both are dropped by the explode that
  * always follows). TextOpsSpec asserts equality against the composed form
  * on the real documents corpus, which is what makes the swap oracle-safe.
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT) inputs, got ${l.sql} and ${r.sql}")
    }
  override def nullSafeEval(text: Any, n: Any): Any =
    TextOps.shingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextOps.shingles($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
}

object TextOps {
  private val WhitespaceRe = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** See [[WordShingles]]. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // the same calls Spark's Lower and StringSplit expressions make,
    // so tokenization is byte-identical to split(lower(text), '\s+')
    val toks = text.toLowerCase.split(WhitespaceRe, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](toks.length * 2)
    var i = 0
    while (i <= toks.length - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks(i + k); k += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** SQL registration (idempotent): word_shingles(text, n). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "scala_udf")

  /** Column entry point; register on the owning session first. */
  def shinglesCol(text: Column, n: Column): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", text, n)
}
