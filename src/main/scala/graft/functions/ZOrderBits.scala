package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative 32-bit keys into one
  * 64-bit sort key — the multi-dimensional clustering primitive: data
  * written in z-value order is range-local in BOTH dimensions at once, so
  * parquet min/max stats prune files/row-groups for predicates on either
  * key (the Delta/Iceberg OPTIMIZE ZORDER layout, done here as a plain
  * write-time sort). Native codegen expression — the bit-spread is six
  * shift/mask ops per operand, no loop, stays in WholeStageCodegen.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (BIGINT, BIGINT), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder2.morton($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

object ZOrder2 {
  /** Spread the low 32 bits of v onto the even bit positions of a long. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave: x on even bits, y on odd. Values above 2^32-1 wrap (keys
    * wider than 32 bits should be rank- or bucket-reduced first). */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(exprs.head, exprs(1)), "scala_udf")

  def zorder2(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("zorder2", a, b)
}
