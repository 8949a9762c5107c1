package graft.operators

import org.apache.spark.sql.functions._
import graft.core.MatDb

/** Incrementally-maintained aggregate — a materialized GROUP BY view over a
  * graft table kept current from the CDC feed, never by rescanning the
  * base: classic incremental view maintenance (retract the pre-image,
  * apply the post-image), built from `changesBetween`'s minimal delta.
  *
  * The view is itself a graft table (group = dimension; SUM and COUNT =
  * value columns), so it inherits MVCC time travel, snapshot isolation,
  * and the commit protocol — each maintenance step is ONE transaction, and
  * `viewDb.asOf(t)` is the aggregate as of maintenance step t.
  *
  * Exactness: SUM over a DECIMAL value column is associative and
  * order-free, so the incrementally-maintained sum is bit-equal to a full
  * recompute (the q117 gate pins incremental-vs-relational equality
  * through DuckDB; the float shortcut would drift by summation order —
  * same reason the battery's aggregate rules cast to DECIMAL).
  *
  * Scale shape: cost per step is O(delta) — `changesBetween` restricts
  * resolution to touched keys; the delta folds map-side to one row per
  * TOUCHED GROUP; the view update joins that (small) per-group delta
  * against the view's current rows for those groups only. A 100 TB base
  * table with a million-row daily delta maintains its per-source totals by
  * reading the delta, not the table.
  */
object IncrementalAgg {

  /** Loud guard for the non-null `valueCol` contract: a null would vanish
    * from SUM but still count in `cnt` (SQL's SUM-skips-nulls vs COUNT(*)
    * mismatch), silently skewing the view forever. One cheap probe over
    * the delta (the only place new nulls can enter); the batch fails
    * BEFORE any view transaction opens, so nothing commits. */
  private def requireNoNullValues(delta: org.apache.spark.sql.DataFrame,
      valueCol: String): Unit =
    require(delta.where(col("op").isin("I", "U") && col(valueCol).isNull)
      .limit(1).isEmpty,
      s"delta contains null $valueCol rows — the view's SUM would skip them " +
        "while cnt counts them; coalesce or filter upstream (nothing was applied)")

  /** Fold the base table's delta `(fromTxn, toTxn]` into the view.
    *
    * `viewDb` schema contract: dimensions = (`groupCol`), values =
    * (`sum_<valueCol>` of the value column's type, `cnt` LONG). `groupCol`
    * must be a base DIMENSION or LONG value column; `valueCol` a base
    * value column (DECIMAL recommended — see exactness note above) and
    * NON-NULL, enforced loudly per batch ([[requireNoNullValues]]): a null
    * would vanish from the sum but still count in `cnt` (SQL's
    * SUM-skips-nulls vs COUNT(*) mismatch) — filter or coalesce nulls
    * upstream. Rows
    * whose count reaches zero are deleted (a group with no rows has no
    * aggregate, matching GROUP BY semantics). Returns the view's
    * maintenance transaction id. */
  def maintain(base: MatDb, viewDb: MatDb, fromTxn: Long, toTxn: Long,
      groupCol: String, valueCol: String): Long = {
    val sumCol = s"sum_$valueCol"
    require(viewDb.schema.dimNames == Seq(groupCol) &&
      viewDb.schema.valueNames == Seq(sumCol, "cnt"),
      s"view schema must be dims=($groupCol), values=($sumCol, cnt); " +
        s"got dims=${viewDb.schema.dimNames} values=${viewDb.schema.valueNames}")
    val delta = base.changesBetween(fromTxn, toTxn, includeOld = true)
    requireNoNullValues(delta, valueCol)
    val isDim = base.schema.dimNames.contains(groupCol)
    val oldG = if (isDim) col(groupCol) else col(s"_old_$groupCol")
    // retract the pre-image (U and D rows), apply the post-image (I and U
    // rows) — a group-moving update retracts from one group and applies to
    // the other through the same two legs
    val retract = delta.where(col("op").isin("U", "D"))
      .select(oldG.as(groupCol), (-col(s"_old_$valueCol")).as("dv"), lit(-1L).as("dc"))
    val apply_ = delta.where(col("op").isin("I", "U"))
      .select(col(groupCol), col(valueCol).as("dv"), lit(1L).as("dc"))
    val perGroup = retract.unionByName(apply_)
      .groupBy(col(groupCol))
      .agg(sum(col("dv")).cast(delta.schema(valueCol).dataType).as("dv"),
        sum(col("dc")).as("dc"))
    // the view streams through ONE semi-join against the (small, broadcast)
    // touched-group set — the view is never shuffled whole, mirroring the
    // ingest sinks' history-streams/delta-broadcasts contract
    val current = viewDb.snapshot()
      .join(broadcast(perGroup.select(col(groupCol))), Seq(groupCol), "left_semi")
      .select(col(groupCol), col(sumCol).as("_cur_sum"), col("cnt").as("_cur_cnt"))
    // decimal addition widens precision (18,4 + 18,4 → 19,4); cast back to
    // the view's declared type so segments stay byte-compatible
    val sumType = viewDb.schema.values.find(_.name == sumCol).get.dataType
    val merged = perGroup.join(current, Seq(groupCol), "left")
      .select(col(groupCol),
        (coalesce(col("_cur_sum"), lit(0).cast(sumType)) + col("dv"))
          .cast(sumType).as(sumCol),
        (coalesce(col("_cur_cnt"), lit(0L)) + col("dc")).as("cnt"))
    val txn = viewDb.newTransaction()
    txn.deleteRows(merged.where(col("cnt") === 0L).select(col(groupCol)))
    txn.addRows(merged.where(col("cnt") =!= 0L))
    txn.commit()
    txn.id.getOrElse(-1L)
  }

  /** As [[maintain]], but REPLAY-ABSORBABLE: instead of adding a delta to
    * the view's current values (which double-counts if the same range is
    * ever applied twice), recompute the AFFECTED GROUPS' aggregates
    * absolutely from `base.asOf(toTxn)` and upsert them. Re-running the
    * LAST applied range lands byte-identical rows, which MVCC newest-wins
    * resolution absorbs — the same exactly-once-resolved contract as the
    * streaming ingest sinks, making this the mode
    * [[graft.streaming.Streams.viewMaintSink]] uses under at-least-once
    * `foreachBatch` delivery. The contract is TAIL replay only — exactly
    * what a checkpointed stream can deliver (the final incomplete batch
    * re-runs; earlier ranges are never re-presented). Re-applying a
    * STALE range after newer ranges have landed would regress the view
    * to asOf(its toTxn) for its touched groups — don't hand-drive this
    * mode out of order.
    *
    * The trade: cost is O(history of touched GROUPS), not O(delta) — the
    * restricted recompute streams the base through one semi-join against
    * the broadcast touched-group set (groups touched by the delta,
    * pre- or post-image). Right for fine-grained groups (per-user,
    * per-document); for coarse groups (per-source over a 100 TB corpus)
    * prefer [[maintain]] under a driver that guarantees each range is
    * applied once. Reading `asOf(toTxn)` (not the live snapshot) is what
    * makes replay deterministic even after the base has moved on. */
  def maintainAbsolute(base: MatDb, viewDb: MatDb, fromTxn: Long, toTxn: Long,
      groupCol: String, valueCol: String): Long = {
    val sumCol = s"sum_$valueCol"
    require(viewDb.schema.dimNames == Seq(groupCol) &&
      viewDb.schema.valueNames == Seq(sumCol, "cnt"),
      s"view schema must be dims=($groupCol), values=($sumCol, cnt); " +
        s"got dims=${viewDb.schema.dimNames} values=${viewDb.schema.valueNames}")
    maintainAbsoluteMulti(base, viewDb, fromTxn, toTxn, groupCol)
  }

  /** [[maintainAbsolute]] generalized: the VIEW SCHEMA is the aggregate
    * spec. The view's dimension is the group column; every value column
    * declares its aggregate by NAME — `sum_<col>`, `min_<col>`,
    * `max_<col>` over base columns, or `cnt` (row count). All of one
    * view's aggregates are maintained from a single restricted recompute
    * (one semi-join + one multi-aggregate pass over the touched groups'
    * history), so adding aggregates costs buffer width, not passes.
    *
    * MIN/MAX are only safe in THIS absolute mode: a delta-based retract
    * cannot undo a retired extremum without the group's history, which the
    * restricted recompute reads anyway. Same replay-absorbable tail-replay
    * contract as [[maintainAbsolute]]. Null contract: `sum_` inputs must
    * be non-null (guarded per batch); `min_`/`max_` skip nulls natively
    * and `cnt` counts rows, so they need no guard. */
  def maintainAbsoluteMulti(base: MatDb, viewDb: MatDb, fromTxn: Long, toTxn: Long,
      groupCol: String,
      precomputedDelta: Option[org.apache.spark.sql.DataFrame] = None): Long = {
    require(viewDb.schema.dimNames == Seq(groupCol),
      s"view must be keyed by ($groupCol); got dims=${viewDb.schema.dimNames}")
    val aggs: Seq[org.apache.spark.sql.Column] = viewDb.schema.values.map { v =>
      def src(prefix: String): String = {
        val c = v.name.stripPrefix(prefix)
        require(base.schema.columnNames.contains(c),
          s"view column ${v.name} names no base column '$c'")
        c
      }
      v.name match {
        case "cnt" => count(lit(1)).as("cnt")
        case n if n.startsWith("sum_") => sum(col(src("sum_"))).cast(v.dataType).as(n)
        case n if n.startsWith("min_") => min(col(src("min_"))).cast(v.dataType).as(n)
        case n if n.startsWith("max_") => max(col(src("max_"))).cast(v.dataType).as(n)
        case other => throw new IllegalArgumentException(
          s"view value column '$other' declares no aggregate " +
            "(expected sum_<col>, min_<col>, max_<col>, or cnt)")
      }
    }
    // the change scan is the expensive leg (two restricted dedups + a
    // full-outer join) and every downstream reference would re-run it:
    // null guards, the touched-group union, the anti-join. Persist it for
    // the duration of the maintenance — O(batch) rows, never O(base). A
    // caller maintaining SEVERAL views of one batch precomputes it once
    // and passes it in (viewMaintSink), halving-or-better the per-batch
    // fixed cost; we only own (and release) what we created.
    val delta = precomputedDelta.getOrElse(
      base.changesBetween(fromTxn, toTxn, includeOld = true))
    val owned = precomputedDelta.isEmpty
    if (owned) delta.persist()
    try {
      viewDb.schema.valueNames.filter(_.startsWith("sum_")).map(_.stripPrefix("sum_"))
        .distinct.foreach(requireNoNullValues(delta, _))
      val isDim = base.schema.dimNames.contains(groupCol)
      val oldG = if (isDim) col(groupCol) else col(s"_old_$groupCol")
      val touched = delta.select(col(groupCol)).where(col(groupCol).isNotNull)
        .union(delta.select(oldG.as(groupCol)).where(oldG.isNotNull))
        .distinct()
      val newAgg = base.asOf(toTxn)
        .join(broadcast(touched), Seq(groupCol), "left_semi")
        .groupBy(col(groupCol))
        .agg(aggs.head, aggs.tail: _*)
      val emptied = touched.join(newAgg.select(col(groupCol)), Seq(groupCol), "left_anti")
      val txn = viewDb.newTransaction()
      txn.deleteRows(emptied)
      txn.addRows(newAgg)
      txn.commit()
      txn.id.getOrElse(-1L)
    } finally { if (owned) { delta.unpersist(); () } }
  }
}
