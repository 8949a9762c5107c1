package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen kernels for the similarity-search family (q50/q53/q55 and
  * [[graft.operators.IvfIndex]]). The `aggregate(zip_with(...))` HOF
  * formulation is correct but runs INTERPRETED with a boxed Double per
  * element (observed directly in task jstacks: `BoxesRunTime.boxToDouble`
  * under `ArrayTransform.eval`); these expressions generate a tight
  * primitive loop inside the WholeStageCodegen span instead.
  *
  * Accumulation is the identical left fold (`((0+x1)+x2)+…`, IEEE double
  * adds), so results are BIT-IDENTICAL to the HOF form and the DuckDB
  * `list_reduce` oracles — swapping these in cannot move a hash
  * (FunctionsSpec asserts exact equality on real embeddings).
  *
  * Defined for equal-length arrays of non-null doubles (embeddings);
  * length mismatch throws rather than silently yielding null.
  */
private[graft] trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE> inputs, got ${l.sql} and ${r.sql}")
    }
}

/** Left-fold dot product Σ a(i)*b(i). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Left-fold squared L2 distance Σ (a(i)-b(i))². */
case class SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_sqdist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.sqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
}

/** L2-normalize: x(i) / sqrt(Σ x(j)²), one pass over the array. The HOF form
  * `transform(v, x -> x / sqrt(vec_dot(v, v)))` re-evaluates the norm
  * subexpression per ELEMENT in interpreted lambda evaluation — 64× the
  * work for a 64-dim embedding; this kernel computes it once. Same IEEE
  * divide, so values are bit-identical to the HOF form. */
case class VecNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> input, got ${t.sql}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorOps.normalize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.normalize($a)")
  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(child = c)
}

object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_sqdist: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }

  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** SQL registration (idempotent): vec_dot(a, b), vec_sqdist(a, b),
    * vec_norm(a). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist", exprs => SquaredDistance(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VecNormalize(exprs(0)), "scala_udf")
  }

  /** Column entry points; register on the owning session first. */
  def dotCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  def sqDistCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_sqdist", a, b)
  def normCol(a: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_norm", a)
}
