package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Aggregation state of [[TopKScored]]: the k best (score, id) pairs in two
  * primitive arrays, kept ordered best-first by (score desc, id asc) — no
  * boxing, no Scala collections, O(1) reject once full (the common case on
  * a warm partition), O(k) shift on accept (k is small by contract).
  */
final class TopKState(val k: Int) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  // Spark's SQL double ordering (SQLOrderingUtil.compareDoubles): == first
  // so -0.0 equals 0.0, then Double.compare so NaN ranks above +Inf. Raw
  // </> operators would make a NaN score unbeatable-yet-never-inserted
  // (every comparison false), silently corrupting the buffer's order and
  // breaking the documented identity with the row_number() window form.
  @inline private def cmpScore(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  @inline private def beats(s: Double, i: Long, pos: Int): Boolean = {
    val c = cmpScore(s, scores(pos))
    c > 0 || (c == 0 && i < ids(pos))
  }

  def insert(id: Long, score: Double): Unit = {
    if (n == k) {
      if (!beats(score, id, n - 1)) return // O(1) reject against the kth
    } else n += 1
    var pos = n - 1
    while (pos > 0 && beats(score, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = score; ids(pos) = id
  }
}

/** `topk_scored(id, score, k)` → array<struct<id,score>>: grouped top-k as
  * a Catalyst [[TypedImperativeAggregate]] — the aggregate-function
  * counterpart of the repo's codegen scalar kernels, one tier below the
  * typed `Aggregator` ([[TopKAggregator]]): the buffer is two primitive
  * arrays serialized as 16 bytes/entry (vs an encoder round-trip of a
  * `List[Scored]` per merge), updates read the input row directly, and the
  * operator is `ObjectHashAggregate` with map-side partial aggregation —
  * the shuffle still carries O(k) per group, now at minimum constant cost.
  * Order within a group: (score desc, id asc) under Spark's SQL double
  * ordering (NaN above +Inf, -0.0 = 0.0), identical to [[TopKAggregator]]
  * and to the `row_number()` window form the oracle uses (FunctionsSpec
  * pins the equality, NaN included). Rows with a NULL id or score are
  * IGNORED — standard aggregate-function semantics (like `max`); the
  * window form instead ranks NULL scores last, so the two diverge only
  * for groups with fewer than k non-null rows.
  */
case class TopKScored(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {
  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    (idExpr.dataType, scoreExpr.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, DOUBLE) inputs, got ${i.sql} and ${s.sql}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_scored"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buffer.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.n) { buffer.insert(other.ids(i), other.scores(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) { rows(i) = InternalRow(buffer.ids(i), buffer.scores(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + buffer.n * 16)
    out.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { out.putLong(buffer.ids(i)); out.putDouble(buffer.scores(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = ByteBuffer.wrap(bytes)
    val st = new TopKState(k)
    val n = in.getInt
    var i = 0
    // entries arrive best-first, so every insert is an O(1) append
    while (i < n) { val id = in.getLong; val sc = in.getDouble; st.insert(id, sc); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKScored =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKScored =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKScored =
    copy(idExpr = c(0), scoreExpr = c(1))
}

object TopKScored {
  /** Register `topk_scored(id, score, k)`; k must be an INT literal (it
    * sizes the aggregation buffer at plan time). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_scored",
      {
        case Seq(id, score, Literal(kv: Int, IntegerType)) =>
          TopKScored(Cast(id, LongType), Cast(score, DoubleType), kv).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "usage: topk_scored(id BIGINT, score DOUBLE, k INT literal)")
      },
      "scala_udf")

  /** Column entry point; register on the owning session first. */
  def topkCol(id: Column, score: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("topk_scored", id, score,
      org.apache.spark.sql.functions.lit(k))
}
