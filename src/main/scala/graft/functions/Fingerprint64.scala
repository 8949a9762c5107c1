package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit fingerprint of a string — a native Catalyst expression with
  * whole-stage codegen (document fingerprinting for the dedup pipeline; the
  * UDF-free fast path the builder guide calls for).
  *
  * Runs over the UTF8String bytes directly — no copy, no decode — and
  * generates a tight loop via doGenCode, so it stays inside the
  * WholeStageCodegen span instead of forcing an interpreted fallback.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint64 requires STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over the string's UTF-8 bytes. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  /** SQL registration: SELECT fingerprint64(text) ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "scala_udf")

  /** Column-level entry point (requires [[register]] on the session). */
  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fingerprint64", c)
}
