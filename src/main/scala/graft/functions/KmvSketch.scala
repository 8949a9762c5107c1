package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Aggregation state of [[KmvSketch]]: the k smallest DISTINCT hash values
  * seen so far, kept ascending in one primitive array — no boxing, binary
  * search + O(k) shift on accept, O(1) reject once full (the common case on
  * a warm partition). Distinctness is structural: an already-present value
  * is a no-op, so feeding RAW rows (no pre-`distinct` shuffle) yields the
  * same sketch as feeding the distinct set.
  */
final class KmvState(val k: Int) {
  val hs = new Array[Long](k) // ascending, hs(0..n-1) valid
  var n = 0

  def insert(h: Long): Unit = {
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && hs(lo) == h) return // already in the sketch
    if (n == k) {
      if (lo >= k) return // larger than the current kth-smallest
      var i = k - 1
      while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
      hs(lo) = h
    } else {
      var i = n
      while (i > lo) { hs(i) = hs(i - 1); i -= 1 }
      hs(lo) = h
      n += 1
    }
  }
}

/** `kmv_sketch(h, k)` → array<bigint>: a K-Minimum-Values distinct-count
  * sketch (Bar-Yossef et al. 2002) as a Catalyst
  * [[TypedImperativeAggregate]] — the fourth mergeable sketch in the repo
  * (HLL `operators.Hll`, Count-Min `operators.CountMin`, histogram
  * quantiles `operators.HistQuantile`) and the only one whose MERGE is
  * itself exact set algebra: the k smallest of a union are a subset of the
  * union of each side's k smallest, so `kmv(A ∪ B) = merge(kmv(A),
  * kmv(B))` holds exactly, giving replayable union cardinality and
  * inclusion–exclusion intersection estimates across pre-computed
  * per-partition sketches.
  *
  * Cross-engine replayable by construction: the sketch is literally "the k
  * smallest distinct values of an integer column", which any SQL engine
  * reproduces with `row_number() OVER (ORDER BY h) <= k` over the distinct
  * set — no floating point, no randomness. The estimator
  * `(k-1) * 2^56 / kth_min` (for the repo's 56-bit hash space) is then
  * per-row IEEE double arithmetic, deterministic on both sides.
  *
  * Scale shape: `ObjectHashAggregate` with map-side partial aggregation —
  * the shuffle carries one O(k) array per group per map partition,
  * independent of data volume. Rows with a NULL hash are ignored
  * (standard aggregate semantics, like `max`).
  */
case class KmvSketch(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {
  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def checkInputDataTypes(): TypeCheckResult = hashExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash input, got ${t.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val h = hashExpr.eval(input)
    if (h != null) buffer.insert(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    var i = 0
    while (i < other.n) { buffer.insert(other.hs(i)); i += 1 }
    buffer
  }

  override def eval(buffer: KmvState): Any = {
    val out = new Array[Long](buffer.n)
    System.arraycopy(buffer.hs, 0, out, 0, buffer.n)
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + buffer.n * 8)
    out.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { out.putLong(buffer.hs(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val in = ByteBuffer.wrap(bytes)
    val st = new KmvState(k)
    val n = in.getInt
    var i = 0
    // entries arrive ascending, so every insert is an O(1) append
    while (i < n) { st.insert(in.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(hashExpr = c(0))
}

object KmvSketch {
  /** Register `kmv_sketch(h, k)`; k must be an INT literal (it sizes the
    * aggregation buffer at plan time). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      {
        case Seq(h, Literal(kv: Int, IntegerType)) =>
          KmvSketch(Cast(h, LongType), kv).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "usage: kmv_sketch(h BIGINT, k INT literal)")
      },
      "scala_udf")

  /** Column entry point; register on the owning session first. */
  def kmvCol(h: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("kmv_sketch", h,
      org.apache.spark.sql.functions.lit(k))
}
