package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Dimension, MatDb, MatSchema, TestSpark, ValueCol}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** graft.operators.IncrementalAgg — battery q117's operator. Invariant:
  * after every maintenance step, the view equals a full GROUP BY recompute
  * of the base snapshot, exactly (DECIMAL sums are order-free). */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dec = DecimalType(18, 4)

  private def newBase(): MatDb = MatDb.create(spark,
    MatSchema(Seq(Dimension("k", 100)),
      Seq(ValueCol("g", LongType), ValueCol("v", dec))),
    Files.createTempDirectory("graft-iagg-base").toString, "manifest")

  private def newView(): MatDb = MatDb.create(spark,
    MatSchema(Seq(Dimension("g", 100)),
      Seq(ValueCol("sum_v", dec), ValueCol("cnt", LongType))),
    Files.createTempDirectory("graft-iagg-view").toString, "manifest")

  private def recompute(base: MatDb): Map[Long, (String, Long)] =
    base.snapshot().groupBy(col("g"))
      .agg(sum(col("v")).cast(dec).as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1).toPlainString, r.getLong(2)))).toMap

  private def viewState(view: MatDb): Map[Long, (String, Long)] =
    view.snapshot().collect().map(r => r.getLong(0) ->
      ((r.getDecimal(1).toPlainString, r.getLong(2)))).toMap

  test("view equals a full recompute after insert, group-move update, and delete") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))

    val t1 = base.newTransaction()
    t1.addRows(df((0L until 20L).map(k => (k, k % 4, s"${k}.25")))); t1.commit()
    assert(IncrementalAgg.maintain(base, view, 0L, 1L, "g", "v") === 1L)
    assert(viewState(view) === recompute(base))

    // txn 2: change values for g=0 keys; MOVE keys 1,5 from g=1 to g=9
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((0L, 0L, "100.0000"), (4L, 0L, "200.0000"),
      (1L, 9L, "1.2500"), (5L, 9L, "5.2500"))))
    t2.commit()
    IncrementalAgg.maintain(base, view, 1L, 2L, "g", "v")
    assert(viewState(view) === recompute(base))
    assert(viewState(view)(9L)._2 === 2L, "moved keys must appear in the new group")

    // txn 3: delete every g=2 key — the group's view row must disappear
    val t3 = base.newTransaction()
    t3.deleteRows((0L until 20L).filter(_ % 4 == 2).toDF("k")); t3.commit()
    IncrementalAgg.maintain(base, view, 2L, 3L, "g", "v")
    assert(viewState(view) === recompute(base))
    assert(!viewState(view).contains(2L), "an emptied group has no aggregate row")

    // a second view maintained in ONE step over the same range agrees
    val view2 = newView()
    IncrementalAgg.maintain(base, view2, 0L, 3L, "g", "v")
    assert(viewState(view2) === viewState(view))

    // the view is itself a graft table: time travel to maintenance step 1
    assert(view.asOf(1L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
  }

  test("maintainAbsolute equals a recompute and absorbs a tail replay") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction()
    t1.addRows(df((0L until 20L).map(k => (k, k % 4, s"${k}.50")))); t1.commit()
    IncrementalAgg.maintainAbsolute(base, view, 0L, 1L, "g", "v")
    assert(viewState(view) === recompute(base))
    // group move + value change + a delete emptying group 3
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((1L, 9L, "1.5000"), (0L, 0L, "77.0000"))))
    t2.deleteRows((0L until 20L).filter(_ % 4 == 3).toDF("k"))
    t2.commit()
    IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v")
    val afterT2 = viewState(view)
    assert(afterT2 === recompute(base))
    assert(!afterT2.contains(3L))
    // tail replay of the SAME range (the foreachBatch crash case): the
    // recomputed rows are byte-identical, MVCC-absorbed — view unchanged
    IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v")
    assert(viewState(view) === afterT2)
  }

  test("a no-op delta commits nothing new to the view") {
    val base = newBase(); val view = newView()
    import spark.implicits._
    val t1 = base.newTransaction()
    t1.addRows(Seq((1L, 1L, "2.5000")).toDF("k", "g", "vs")
      .select(col("k"), col("g"), col("vs").cast(dec).as("v")))
    t1.commit()
    IncrementalAgg.maintain(base, view, 0L, 1L, "g", "v")
    val before = viewState(view)
    IncrementalAgg.maintain(base, view, 1L, 1L, "g", "v") // empty range
    assert(viewState(view) === before)
  }

  test("maintainAbsoluteMulti: min/max/sum/cnt views track a recompute across churn") {
    import spark.implicits._
    val base = newBase()
    val view = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100)),
        Seq(ValueCol("min_v", dec), ValueCol("max_v", dec),
          ValueCol("sum_v", dec), ValueCol("cnt", LongType))),
      Files.createTempDirectory("graft-iagg-multi").toString, "manifest")
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    def recomputeAll(): Set[(Long, String, String, String, Long)] =
      base.snapshot().groupBy(col("g"))
        .agg(min(col("v")).cast(dec).as("mn"), max(col("v")).cast(dec).as("mx"),
          sum(col("v")).cast(dec).as("sm"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString,
          r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString, r.getLong(4))).toSet
    def viewAll(): Set[(Long, String, String, String, Long)] =
      view.snapshot().collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString,
        r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString, r.getLong(4))).toSet
    // txn1 seed; txn2 overwrites the group-1 MIN holder upward and the
    // group-2 MAX holder downward (the retired-extremum case a delta
    // retract cannot handle); txn3 deletes group 3 entirely
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, "1.0000"), (2L, 1L, "5.0000"),
      (3L, 2L, "9.0000"), (4L, 2L, "2.0000"), (5L, 3L, "7.0000"))))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "g")
    assert(viewAll() === recomputeAll())
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((1L, 1L, "4.0000"), (3L, 2L, "3.0000"))))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 2L, "g")
    assert(viewAll() === recomputeAll())
    val t3 = base.newTransaction()
    t3.deleteRows(Seq(5L).toDF("k"))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 2L, 3L, "g")
    assert(viewAll() === recomputeAll())
    assert(!viewAll().exists(_._1 == 3L), "an emptied group leaves the view")
    // txn4: INTERIOR churn only — update/delete rows strictly inside their
    // groups' extremes (the clean-merge path: no extremum can retire), plus
    // an insert extending one extreme. The view must still equal a full
    // recompute exactly.
    val t4 = base.newTransaction()
    t4.addRows(df(Seq((6L, 1L, "2.0000"), (7L, 2L, "5.0000")))) // interiors
    t4.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 3L, 4L, "g")
    assert(viewAll() === recomputeAll())
    // g1 now holds {4, 5, 2}, g2 {3, 2, 5}: update k1 (4 -> 3, strictly
    // inside g1's (2,5)), delete k3 (3, strictly inside g2's (2,5)) — both
    // clean-path retractions — and insert k8 extending g1's max
    val t5 = base.newTransaction()
    t5.addRows(df(Seq((1L, 1L, "3.0000"))))
    t5.deleteRows(Seq(3L).toDF("k"))
    t5.addRows(df(Seq((8L, 1L, "9.0000"))))
    t5.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 4L, 5L, "g")
    assert(viewAll() === recomputeAll())
    // an undeclarable aggregate name fails loudly
    val bad = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100)), Seq(ValueCol("avg_v", dec))),
      Files.createTempDirectory("graft-iagg-bad").toString, "manifest")
    intercept[IllegalArgumentException](
      IncrementalAgg.maintainAbsoluteMulti(base, bad, 0L, 3L, "g"))
  }

  test("maintainAbsoluteMultiKeys: a composite (g, h) view tracks a recompute across churn") {
    import spark.implicits._
    val base = MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 100)),
        Seq(ValueCol("g", LongType), ValueCol("h", LongType), ValueCol("v", dec))),
      Files.createTempDirectory("graft-iagg2-base").toString, "manifest")
    // min_v included so the composite key also drives the dirty
    // classification (boundary retraction joins on BOTH key columns)
    val view = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100), Dimension("h", 100)),
        Seq(ValueCol("min_v", dec), ValueCol("sum_v", dec), ValueCol("cnt", LongType))),
      Files.createTempDirectory("graft-iagg2-view").toString, "manifest")
    def df(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("k", "g", "h", "vs")
        .select(col("k"), col("g"), col("h"), col("vs").cast(dec).as("v"))
    def recomputeAll(): Set[(Long, Long, String, String, Long)] =
      base.snapshot().groupBy(col("g"), col("h"))
        .agg(min(col("v")).cast(dec).as("mn"), sum(col("v")).cast(dec).as("sm"),
          count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString,
          r.getLong(4))).toSet
    def viewAll(): Set[(Long, Long, String, String, Long)] =
      view.snapshot().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString,
        r.getLong(4))).toSet
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, 10L, "1.0000"), (2L, 1L, 10L, "5.0000"),
      (3L, 1L, 20L, "9.0000"), (4L, 2L, 10L, "2.0000"), (5L, 2L, 20L, "7.0000"))))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 0L, 1L, Seq("g", "h"))
    assert(viewAll() === recomputeAll())
    // txn2: CELL-moving update (k3 moves h 20 -> 10 inside g=1: retracts
    // from (1,20) — emptying it — applies to (1,10)), plus a MIN-retiring
    // update in (2,10) (2.0 -> 6.0: the dirty path, composite-keyed)
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((3L, 1L, 10L, "9.0000"), (4L, 2L, 10L, "6.0000"))))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 1L, 2L, Seq("g", "h"))
    assert(viewAll() === recomputeAll())
    assert(!viewAll().exists(t => t._1 == 1L && t._2 == 20L),
      "the emptied (1,20) cell leaves the view")
    // txn3: delete the (2,20) cell's only row
    val t3 = base.newTransaction()
    t3.deleteRows(Seq(5L).toDF("k"))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 2L, 3L, Seq("g", "h"))
    assert(viewAll() === recomputeAll())
    // key-order mismatch with the view's dims fails loudly
    intercept[IllegalArgumentException](
      IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 0L, 3L, Seq("h", "g")))
  }

  test("a poisoned delta (null value) fails the batch loudly; nothing commits") {
    val base = newBase(); val view = newView()
    import spark.implicits._
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction(); t1.addRows(df(Seq((1L, 1L, "2.5000")))); t1.commit()
    IncrementalAgg.maintain(base, view, 0L, 1L, "g", "v")
    val before = viewState(view)
    val viewTxns = view.committedSegments.map(_.txnId).distinct.size
    // txn 2: one good row, one NULL v row — SUM would skip it, cnt would
    // count it; the whole batch must fail before the view transaction opens
    val t2 = base.newTransaction()
    t2.addRows(Seq((2L, 1L, "1.0000")).toDF("k", "g", "vs")
      .select(col("k"), col("g"), col("vs").cast(dec).as("v"))
      .unionByName(Seq((3L, 1L)).toDF("k", "g")
        .select(col("k"), col("g"), lit(null).cast(dec).as("v"))))
    t2.commit()
    val err = intercept[IllegalArgumentException](
      IncrementalAgg.maintain(base, view, 1L, 2L, "g", "v"))
    assert(err.getMessage.contains("null"))
    val errAbs = intercept[IllegalArgumentException](
      IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v"))
    assert(errAbs.getMessage.contains("null"))
    assert(viewState(view) === before, "a failed batch must not move the view")
    assert(view.committedSegments.map(_.txnId).distinct.size === viewTxns,
      "a failed batch must not commit a view transaction")
  }

  test("maintenance commits are pinned to base txn ids; asOf aligns to the base clock") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, "1.0000"), (2L, 2L, "2.0000")))); t1.commit()
    IncrementalAgg.maintainAbsolute(base, view, 0L, 1L, "g", "v")
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((3L, 1L, "5.0000")))); t2.commit()
    val applied = IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v")
    assert(applied === 2L, "maintenance txn id == base range end")
    assert(view.committedSegments.map(_.txnId).distinct.sorted === Seq(1L, 2L))
    // the view's txn clock IS the base's: asOf(baseTxn) = view at that txn
    assert(view.asOf(1L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(1L -> 1L, 2L -> 1L))
    assert(view.asOf(2L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(1L -> 2L, 2L -> 1L))
    // a replayed (stale) range is skipped by watermark, not re-applied
    assert(IncrementalAgg.maintainAbsolute(base, view, 0L, 1L, "g", "v") === 2L)
    assert(viewState(view) === recompute(base))
  }

  test("a crashed maintenance attempt's orphan segments are reclaimed on re-run") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, "1.0000"), (2L, 2L, "2.0000")))); t1.commit()
    IncrementalAgg.maintainAbsolute(base, view, 0L, 1L, "g", "v")
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((3L, 1L, "5.0000")))); t2.commit()
    // simulate a crash mid-maintenance of (1,2]: segments flushed at the
    // pinned id, commit never reached (the dir claim a blind re-run would
    // abort on)
    val crashed = view.newPinnedTransaction(2L)
    crashed.addRows(Seq((99L, "1.0000", 1L)).toDF("g", "s", "cnt")
      .select(col("g"), col("s").cast(dec).as("sum_v"), col("cnt")))
    crashed.flush() // flushed, never committed — then "crash"
    IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v")
    assert(viewState(view) === recompute(base))
    assert(!viewState(view).contains(99L), "orphan segment rows must not surface")
  }

  test("cnt_<col> maintains count(col) through null flips, updates, deletes") {
    import spark.implicits._
    // base value column c is NULLABLE — exactly what cnt_c exists for
    // (cnt counts rows, cnt_c counts non-null c values)
    val base = MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 100)),
        Seq(ValueCol("g", LongType), ValueCol("c", LongType))),
      Files.createTempDirectory("graft-iagg-cnt-base").toString, "manifest")
    val view = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100)),
        Seq(ValueCol("cnt_c", LongType), ValueCol("cnt", LongType))),
      Files.createTempDirectory("graft-iagg-cnt-view").toString, "manifest")
    def df(rows: Seq[(Long, Long, Option[Long])]) =
      rows.toDF("k", "g", "c")
    def recomputeAll(): Set[(Long, Long, Long)] =
      base.snapshot().groupBy(col("g"))
        .agg(count(col("c")).as("cnt_c"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def viewAll(): Set[(Long, Long, Long)] =
      view.snapshot().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // txn1: mixed null/non-null seed
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, Some(10L)), (2L, 1L, None), (3L, 2L, Some(7L)),
      (4L, 2L, Some(8L)), (5L, 3L, None))))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "g")
    assert(viewAll() === recomputeAll())
    assert(viewAll().contains((3L, 0L, 1L)), "all-null group: cnt_c 0, cnt 1")
    // txn2: null -> non-null flip (k2), non-null -> null flip (k3), and a
    // group move (k4 to g=9) — every cnt_c retract/apply combination
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((2L, 1L, Some(99L)), (3L, 2L, None), (4L, 9L, Some(8L)))))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 2L, "g")
    assert(viewAll() === recomputeAll())
    // txn3: delete a non-null holder and the all-null group's only row
    val t3 = base.newTransaction()
    t3.deleteRows(Seq(1L, 5L).toDF("k")); t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 2L, 3L, "g")
    assert(viewAll() === recomputeAll())
    assert(!viewAll().exists(_._1 == 3L), "the emptied group leaves the view")
    // one-shot backfill over the same history agrees (absolute path)
    val view2 = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100)),
        Seq(ValueCol("cnt_c", LongType), ValueCol("cnt", LongType))),
      Files.createTempDirectory("graft-iagg-cnt-view2").toString, "manifest")
    IncrementalAgg.maintainAbsoluteMulti(base, view2, 0L, 3L, "g")
    assert(view2.snapshot().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === viewAll())
  }

  test("EXPRESSION min/max maintain through extremum retirement (dirty path)") {
    import spark.implicits._
    val base = MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 100)),
        Seq(ValueCol("g", LongType), ValueCol("a", LongType), ValueCol("b", LongType))),
      Files.createTempDirectory("graft-iagg-xmm-base").toString, "manifest")
    val view = MatDb.create(spark,
      MatSchema(Seq(Dimension("g", 100)),
        Seq(ValueCol("min_ab", LongType), ValueCol("max_ab", LongType),
          ValueCol("sum_ab", LongType), ValueCol("cnt", LongType))),
      Files.createTempDirectory("graft-iagg-xmm-view").toString, "manifest")
    graft.core.Storage.writeProps(view.root,
      graft.core.Storage.readProps(view.root) + ("graft.mview.expr.ab" -> "a * b"))
    def df(rows: Seq[(Long, Long, Long, Long)]) = rows.toDF("k", "g", "a", "b")
    def recomputeAll(): Set[(Long, Long, Long, Long, Long)] =
      base.snapshot().groupBy(col("g"))
        .agg(min(col("a") * col("b")).as("mn"), max(col("a") * col("b")).as("mx"),
          sum(col("a") * col("b")).as("sm"), count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    def viewAll(): Set[(Long, Long, Long, Long, Long)] =
      view.snapshot().collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // g1: products {2*3=6, 4*5=20}; g2: {10*1=10, 2*2=4}
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, 2L, 3L), (2L, 1L, 4L, 5L),
      (3L, 2L, 10L, 1L), (4L, 2L, 2L, 2L))))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "g")
    assert(viewAll() === recomputeAll())
    // txn2: RETIRE g1's max holder downward (4*5=20 -> 1*1=1: the dirty
    // boundary test must evaluate a*b over the PRE-IMAGE to notice) and
    // g2's min holder upward (2*2=4 -> 50*1=50); both expression inputs move
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((2L, 1L, 1L, 1L), (4L, 2L, 50L, 1L))))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 2L, "g")
    assert(viewAll() === recomputeAll())
    // txn3: INTERIOR churn (g1 gains product 4, inside (1,6)) — the clean
    // merge path — plus a delete emptying g2 entirely
    val t3 = base.newTransaction()
    t3.addRows(df(Seq((5L, 1L, 2L, 2L))))
    t3.deleteRows(Seq(3L, 4L).toDF("k"))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 2L, 3L, "g")
    assert(viewAll() === recomputeAll())
    assert(!viewAll().exists(_._1 == 2L))
  }

  test("rebuild: pinned replace recovers a view when the delta is unrecoverable") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction()
    t1.addRows(df((0L until 12L).map(k => (k, k % 3, s"$k.0000")))); t1.commit()
    IncrementalAgg.maintainAbsolute(base, view, 0L, 1L, "g", "v")
    // TRUNCATE the base (txn2), re-seed (txn3), vacuum the pre-truncate
    // history away: the incremental delta over (1, 3] is now unrecoverable
    base.overwrite(df(Nil).limit(0))
    val t3 = base.newTransaction()
    t3.addRows(df(Seq((1L, 1L, "5.0000"), (20L, 7L, "9.0000")))); t3.commit()
    base.vacuum()
    intercept[IllegalStateException](
      base.changesBetween(1L, 3L, includeOld = true).collect())
    // the recovery: one absolute pinned replace at the range end
    assert(IncrementalAgg.rebuild(base, view, 3L, Seq("g")) === 3L)
    assert(viewState(view) === recompute(base))
    assert(!viewState(view).contains(0L), "pre-truncate groups are gone")
    // pinned clock intact: the rebuild IS the view's state at base txn 3,
    // and a replayed rebuild is skipped by watermark
    assert(view.txnWatermark === 3L)
    assert(IncrementalAgg.rebuild(base, view, 3L, Seq("g")) === 3L)
    assert(viewState(view) === recompute(base))
    // the maintenance stamp survives, so later incremental folds resume
    val t4 = base.newTransaction()
    t4.addRows(df(Seq((21L, 7L, "1.0000")))); t4.commit()
    IncrementalAgg.maintainAbsolute(base, view, 3L, 4L, "g", "v")
    assert(viewState(view) === recompute(base))
  }

  test("an unaligned view (fresh from a later range) falls back to absolute recompute") {
    import spark.implicits._
    val base = newBase(); val view = newView()
    def df(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "g", "vs").select(col("k"), col("g"), col("vs").cast(dec).as("v"))
    val t1 = base.newTransaction()
    t1.addRows(df(Seq((1L, 1L, "1.0000"), (2L, 2L, "2.0000")))); t1.commit()
    val t2 = base.newTransaction()
    t2.addRows(df(Seq((1L, 1L, "3.0000"), (4L, 4L, "4.0000")))); t2.commit()
    // view watermark (0) != fromTxn (1): a delta merge would retract from
    // rows the view never had; the fallback recomputes touched groups
    // absolutely from base.asOf(2)
    IncrementalAgg.maintainAbsolute(base, view, 1L, 2L, "g", "v")
    val st = viewState(view)
    assert(st(1L) === (("3.0000", 1L)), "touched group 1 recomputed absolutely")
    assert(st(4L) === (("4.0000", 1L)))
    assert(!st.contains(2L), "untouched group 2 is not backfilled by a ranged catch-up")
  }
}
