package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** `h56(s)` → the project's cross-engine 56-bit md5 hash as a scalar
  * kernel: value-identical to `conv(substring(md5(s), 1, 14), 16, 10)
  * ::long` (first 14 hex chars = first 7 digest bytes) without
  * materializing the 32-char hex string per row. TextOpsSpec pins the
  * equality on the corpus shingles. */
case class Md5H56(child: Expression) extends UnaryExpression {
  override def prettyName: String = "h56"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${t.sql}")
  }
  override def nullSafeEval(a: Any): Any =
    TextOps.md5h56(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextOps.md5h56($a)")
  override protected def withNewChildInternal(c: Expression): Md5H56 =
    copy(child = c)
}

/** `word_grams(text, n)` → array<string>: ORDERED word n-grams of
  * lower(text), duplicates kept (positions matter — winnowing input).
  * Same tokenization as [[WordShingles]]; rows with fewer than n tokens
  * yield an empty array. */
case class WordGrams(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "word_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, INT) inputs, got ${l.sql} and ${r.sql}")
    }
  override def nullSafeEval(text: Any, n: Any): Any =
    TextOps.grams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextOps.grams($t, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordGrams =
    copy(left = l, right = r)
}

private[graft] trait StringArrayUnary extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.sql}")
  }
}

/** `simhash56(tokens)` → 56-bit SimHash over the DISTINCT tokens: for each
  * bit j, sum ±1 over tokens by bit j of the token's 56-bit md5 hash
  * (graft's cross-engine `h56`), bit set iff the sum is positive. Equal by
  * construction to the explode → h56 → groupBy(sum±1 × 56) formulation it
  * replaces (TextOpsSpec pins it) — but it is a pure per-row map: the
  * signature stage of q48/q49 needs NO shuffle at all. */
case class Simhash56(child: Expression) extends StringArrayUnary {
  override def prettyName: String = "simhash56"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    TextOps.simhash56(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextOps.simhash56($a)")
  override protected def withNewChildInternal(c: Expression): Simhash56 =
    copy(child = c)
}

/** `minhash16(shingles)` → the 16 MinHash permutation minima over the
  * DISTINCT shingles, permutation j being `(37+101j)·(h56(g) % P) + 17+13j
  * mod P`, P = 1e9+7 — the exact arithmetic of the q47 aggregate form and
  * its DuckDB oracle. Null (no shingles) when the array is empty, matching
  * the groupBy form where such docs simply have no rows. */
case class MinHash16(child: Expression) extends StringArrayUnary {
  override def prettyName: String = "minhash16"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    TextOps.minhash16(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.TextOps"
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $f.minhash16($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(c: Expression): MinHash16 =
    copy(child = c)
}

/** `winnow56(grams, w)` → winnowing fingerprint set: 56-bit md5 hash per
  * ordered gram, minimum per sliding window of w consecutive grams, distinct
  * minima in first-window order. Empty when there are fewer than w grams
  * (only complete windows fingerprint). One O(len) pass (monotone deque);
  * the whole winnowing stage becomes a shuffle-free map + explode. */
case class Winnow56(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "winnow56"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, INT) inputs, got ${l.sql} and ${r.sql}")
    }
  override def nullSafeEval(grams: Any, w: Any): Any =
    TextOps.winnow56(grams.asInstanceOf[ArrayData], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w) => s"graft.functions.TextOps.winnow56($g, $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Winnow56 =
    copy(left = l, right = r)
}

object TextOps {
  private val WhitespaceRe = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")
  private val P = 1000000007L // minhash modulus — keep in sync with Pipeline

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** 56-bit md5 hash of a string — identical to the cross-engine column
    * form `conv(substring(md5(s), 1, 14), 16, 10)::long` (first 14 hex
    * chars = first 7 digest bytes, big-endian). */
  def md5h56(s: UTF8String): Long = {
    val d = Md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h
  }

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

  /** See [[WordGrams]]. */
  def grams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.split(WhitespaceRe, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = toks(i + k); k += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[Simhash56]]. */
  def simhash56(tokens: ArrayData): Long = {
    val m = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val counts = new Array[Int](56)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      if (seen.add(t)) {
        val h = md5h56(t)
        var j = 0
        while (j < 56) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 56) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** See [[MinHash16]]; null for an empty shingle set (no signature). */
  def minhash16(shingles: ArrayData): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val hp = md5h56(shingles.getUTF8String(i)) % P
      var j = 0
      while (j < 16) {
        val v = ((37L + 101L * j) * hp + (17L + 13L * j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** See [[Winnow56]]. */
  def winnow56(grams: ArrayData, w: Int): ArrayData = {
    val m = grams.numElements()
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = md5h56(grams.getUTF8String(i)); i += 1 }
    // sliding-window minimum via monotone index deque
    val fps = new java.util.LinkedHashSet[Long]()
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail) indexes into hs, increasing h
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) fps.add(hs(deque(head)))
      i += 1
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** SQL registration (idempotent): word_shingles, word_grams, simhash56,
    * minhash16, winnow56. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "h56", exprs => Md5H56(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "word_grams", exprs => WordGrams(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash56", exprs => Simhash56(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash16", exprs => MinHash16(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "winnow56", exprs => Winnow56(exprs(0), exprs(1)), "scala_udf")
  }

  /** Column entry points; register on the owning session first. */
  def h56Col(s: Column): Column =
    org.apache.spark.sql.functions.call_function("h56", s)
  def shinglesCol(text: Column, n: Column): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", text, n)
  def gramsCol(text: Column, n: Column): Column =
    org.apache.spark.sql.functions.call_function("word_grams", text, n)
  def simhash56Col(tokens: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash56", tokens)
  def minhash16Col(shingles: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash16", shingles)
  def winnow56Col(grams: Column, w: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow56", grams, w)
}
