package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view AUTO-REWRITE: answer a base-table GROUP BY from its
  * incrementally-maintained aggregate view ([[graft.operators.IncrementalAgg]])
  * instead of scanning the base.
  *
  * The 100 TB story: a maintained view holds one row per group — answering
  * `SELECT g, sum(v), count(*) FROM base GROUP BY g` from it reads O(groups)
  * bytes instead of O(base). The maintenance side already made each delta
  * O(batch); this closes the READ side, so the common dashboard aggregate
  * never touches the fact table at all (the classic lakehouse MV-rewrite,
  * à la Calcite/Databricks, scoped to the aggregate shapes graft views
  * maintain: a single- or multi-column group key — the view's dimensions,
  * matched as a set, any GROUP BY order, or any SUBSET of them via the
  * rollup path (re-aggregate the view: sum-of-sums, min-of-mins,
  * sum-of-cnts) — and SUM / MIN / MAX / COUNT(*) / AVG, the last derived
  * from the (sum_c, cnt) pair through Spark's own Average evaluation
  * expression so division/precision semantics are never reimplemented).
  *
  * == How a query is recognized ==
  * [[graft.core.MatDb.snapshot]] REGISTERS its analyzed plan's canonicalized
  * form here whenever the table has materialized views declared
  * (`MatDb.registerMaterializedView` → `graft.mviews` table property). The
  * analyzer rule then matches `Aggregate(g, aggs, child)` — optionally with
  * a group-column-only Filter between — whose `child` canonicalizes equal to
  * a registered snapshot. Canonical-plan equality (Spark's own `sameResult`
  * test) is exact: ANY other shape (extra projections, joins, non-group
  * filters) simply fails the lookup and the query runs against the base.
  *
  * == When it is SOUND ==
  * Three checks, all required, evaluated at rewrite time:
  *   1. the view's props carry the maintenance stamp (`graft.mview.base`,
  *      `graft.mview.txn`) written by `IncrementalAgg.maintainAbsoluteMulti`
  *      after each maintenance commit — proof the table at `viewRoot` really
  *      is a maintained view OF THIS BASE and how far it has been maintained;
  *   2. ALIGNMENT — either the stamp's txn equals the registered snapshot's
  *      txn (the view's current state is maintained EXACTLY to the state
  *      the query reads — ahead is as wrong as behind: the snapshot pinned
  *      an older segment set), or the view's own history has a version
  *      pinned EXACTLY at the snapshot's txn (maintenance commits are
  *      pinned to base txn ids, so `view.asOf(t)` IS the aggregate of
  *      `base.asOf(t)` — this serves `VERSION AS OF` dashboards and
  *      current snapshots the view has since advanced past);
  *   3. every aggregate in the query maps onto a view column — `sum(c)` →
  *      `sum_c`, `min(c)` → `min_c`, `max(c)` → `max_c`, `count(c)` →
  *      `cnt_c`, `count(*)`/`count(1)` → `cnt`, declared expressions
  *      (`graft.mview.expr.<n>`) → `sum_n`/`min_n`/`max_n`/`cnt_n` — with
  *      no FILTER clause and no DISTINCT, except `count(DISTINCT d)` over
  *      a helper view keyed by (…group cols…, d): one live view row per
  *      (group, value) combination, so the distinct count is a plain
  *      COUNT of view rows at the rolled-up grain (null-insensitive by
  *      SQL definition, matching the view's null-exclusion).
  *
  * Null contract (inherited from the VIEW's own declaration —
  * [[graft.operators.IncrementalAgg.maintainAbsoluteMultiKeys]]): rows
  * with a null in any view dimension are excluded from the view, so
  * declaring a view over a nullable group column already changes what the
  * view holds; the rewrite trusts that declaration (group columns are
  * effectively non-null — coalesce or filter upstream) rather than
  * re-litigating it per query.
  * Predicate-pushed snapshots never register, so they never rewrite; a
  * time-travel snapshot BELOW every aligned view version fails the
  * alignment witness. A stale or foreign view fails check 1/2 and the
  * query silently runs against the base — the rewrite can change PLANS,
  * never results (MvRewriteSpec pins both directions; the q141 gate pins
  * result-equality against the DuckDB oracle and asserts the rewritten
  * plan reads only view files).
  *
  * Kill switch: `spark.graft.mv.rewrite.enabled = false` (default on).
  */
object MvRegistry {
  final case class Entry(baseRoot: String, snapTxn: Long, viewRoots: Seq[String])

  private val MaxEntries = 256

  // canonicalized snapshot plan -> entry, LRU-evicted at MaxEntries:
  // snapshots of successive table states register distinct keys, and a
  // long-lived multi-tenant service must keep the RECENTLY-USED ones
  // rewritable (the old cap-and-clear dropped everything at once — every
  // live dashboard missed its next rewrite). Eviction only costs a missed
  // rewrite until the next snapshot re-registers.
  private val entries = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[LogicalPlan, Entry](64, 0.75f, /*accessOrder*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, Entry]): Boolean =
        size() > MaxEntries
    })
  // view handles are opened once per JVM and refreshed per use (O(1)
  // manifest-pointer read) — the rule must stay metadata-cheap. Handles are
  // dropped on dropRoot/dropViewHandle so a dropped view's MatDb does not
  // outlive its table (it would re-open lazily if ever referenced again).
  private val handles = new ConcurrentHashMap[String, graft.core.MatDb]()

  def register(key: LogicalPlan, e: Entry): Unit = {
    entries.put(key, e)
    ()
  }

  def lookup(key: LogicalPlan): Option[Entry] = Option(entries.get(key))

  def isEmpty: Boolean = entries.isEmpty

  private[plans] def size: Int = entries.size()

  /** Drop every registration of `baseRoot` AND the handles of the views
    * those registrations pointed at (unregister / DROP TABLE / tests). */
  def dropRoot(baseRoot: String): Unit = entries.synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.baseRoot == baseRoot) {
        e.getValue.viewRoots.foreach(handles.remove)
        it.remove()
      }
    }
  }

  /** Free a single view's cached handle (view dropped or re-created). */
  def dropViewHandle(viewRoot: String): Unit = {
    handles.remove(viewRoot)
    ()
  }

  private[plans] def hasHandle(viewRoot: String): Boolean =
    handles.containsKey(viewRoot)

  private[plans] def viewHandle(spark: SparkSession, root: String): graft.core.MatDb = {
    val h = handles.computeIfAbsent(root, r => graft.core.MatDb.open(spark, r))
    h.refresh()
    h
  }
}

case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty || !enabled) plan
    else plan.resolveOperatorsUp {
      case agg @ Aggregate(groups, aggExprs, child, _)
          if agg.resolved && groups.nonEmpty &&
            groups.forall(_.isInstanceOf[Attribute]) =>
        rewrite(groups.map(_.asInstanceOf[Attribute]), aggExprs, child)
          .getOrElse(agg)
    }

  /** The registered-snapshot pre-filter: graft snapshot outputs carry the
    * chunk-size metadata on their dimension attributes — anything without
    * it cannot be a registered plan, so skip the canonicalization. */
  private def looksLikeSnapshot(p: LogicalPlan): Boolean =
    p.output.exists(_.metadata.contains(graft.core.MatSchema.ChunkKey))

  /** SQL reads arrive as `SubqueryAlias(ident, wrap)` — identity for
    * matching purposes (aliases only affect name resolution, done by now). */
  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, c) =>
      stripAliases(c)
    case other => other
  }

  private def rewrite(gs: Seq[Attribute], aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    if (gs.map(_.name).distinct.size != gs.size) return None
    val (core, cond) = stripAliases(child) match {
      case Filter(c, inner) => (stripAliases(inner), Some(c))
      case other            => (other, None)
    }
    if (!looksLikeSnapshot(core)) return None
    // a Filter between may only reference group columns — any value
    // predicate must see base rows, not the aggregate
    if (cond.exists(c => !c.references.subsetOf(AttributeSet(gs)) || !c.deterministic))
      return None
    val entry = MvRegistry.lookup(core.canonicalized).getOrElse(return None)
    entry.viewRoots.iterator
      .flatMap(r => tryView(r, entry, gs, aggExprs, cond, core))
      .nextOption()
  }

  private def tryView(viewRoot: String, entry: MvRegistry.Entry, gs: Seq[Attribute],
      aggExprs: Seq[NamedExpression], cond: Option[Expression],
      core: LogicalPlan): Option[LogicalPlan] = {
    val view =
      try MvRegistry.viewHandle(spark, viewRoot)
      catch { case _: Exception => return None } // dropped view: never block the query
    // group attrs must be the view's dimensions (any order) — exactly, or
    // a PROPER SUBSET for the rollup path: sum/min/max are decomposable
    // (sum of per-cell sums == total sum; likewise min/max) and count(*)/
    // count(col) roll up as the sum of per-cell counts, so a coarser
    // GROUP BY re-aggregates the VIEW — still O(view rows), never the base.
    val gNames = gs.map(_.name).toSet
    val rollup = !(view.schema.dimNames.toSet == gNames &&
      view.schema.dimNames.size == gs.size)
    if (rollup && !(gNames.subsetOf(view.schema.dimNames.toSet) &&
        gNames.size == gs.size)) return None
    // soundness stamp: written by maintainAbsoluteMulti AFTER each
    // maintenance commit — proves "maintained view of THIS base, through
    // THIS txn" (the relationship proof; never inferred from layout).
    val props = graft.core.Storage.readProps(view.root)
    if (!props.get("graft.mview.base").contains(entry.baseRoot)) return None
    val stampTxn = props.get("graft.mview.txn").map(_.toLong).getOrElse(return None)
    // alignment, two sound cases:
    //   1. stamp == snapshot txn — the view's CURRENT state is maintained
    //      exactly to the state the query reads (ahead is as wrong as
    //      behind: the snapshot pinned an older segment set);
    //   2. PINNED history — maintenance commits are pinned to base txn ids
    //      (IncrementalAgg.maintainAbsoluteMulti), so a view version ending
    //      EXACTLY at the snapshot's txn is the aggregate of base.asOf(txn)
    //      verbatim: `VERSION AS OF` dashboards rewrite too, and a view
    //      that advanced PAST a just-registered current snapshot still
    //      serves it from its aligned version. A snapshot txn the view has
    //      no commit at (mid-batch txn, or view history checkpointed/pruned
    //      below it — the version-max test fails on the fallback's filtered
    //      set) falls through to the base. The pinned case additionally
    //      requires snapTxn <= stampTxn: the stamp is the only PROOF of
    //      maintenance, and it vouches for history through stampTxn only —
    //      a view commit pinned ABOVE the stamp is not a maintenance commit
    //      (e.g. a self-allocated compact() landing at exactly
    //      lastMaintainedBaseTxn+1 would otherwise forge the witness and
    //      serve PRE-txn aggregates for a base snapshot at that txn).
    val vDf =
      if (stampTxn == entry.snapTxn) view.snapshot()
      else if (entry.snapTxn <= stampTxn && view.hasCommitExactlyAt(entry.snapTxn))
        view.asOf(entry.snapTxn)
      else return None

    // fresh plan per rewrite (fresh attribute ids — two rewrites in one
    // query tree must not collide)
    val vPlan = vDf.queryExecution.analyzed
    def vAttr(name: String): Option[Attribute] = vPlan.output.find(_.name == name)
    // DERIVED view columns (`graft.mview.expr.<name>`): parse each
    // declared SQL expression and resolve its column references against
    // the MATCHED snapshot plan's own attributes, so a query aggregate
    // over the same expression compares semantically (commutative
    // operand order and alias ids normalize away in canonicalization).
    // Only self-resolving expression trees qualify (column refs,
    // literals, arithmetic, CAST); anything needing the full analyzer
    // (function lookups) simply never matches — the query falls through
    // to the base, maintenance is unaffected (it analyzes via expr()).
    // fold constant subtrees so an analyzer-inserted literal cast on one
    // side (SQL `1` is INT, widened to the column's LONG) cannot defeat
    // the semantic comparison — ConstantFolding is an optimizer rule and
    // has not run at resolution time on either side
    def fold(e: Expression): Expression = e.transformUp {
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    }
    val declExprs: Seq[(String, Expression)] = props.toSeq.collect {
      case (k, sql) if k.startsWith("graft.mview.expr.") =>
        k.stripPrefix("graft.mview.expr.") -> sql
    }.flatMap { case (n, sql) =>
      try {
        // full analysis via a throwaway Project over the matched snapshot
        // plan: attribute resolution against ITS output ids, implicit type
        // coercion, and function lookup all come from Spark's own analyzer
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val probe = Project(Seq(Alias(parsed, "_e")()), core)
        spark.sessionState.analyzer.execute(probe) match {
          case Project(Seq(a: Alias), _) if a.child.resolved =>
            Some(n -> fold(a.child))
          case _ => None
        }
      } catch { case _: Exception => None }
    }
    def declOf(e: Expression): Option[String] = {
      lazy val folded = fold(e)
      declExprs.collectFirst { case (n, d) if folded.semanticEquals(d) => n }
    }
    // base group attr exprId -> the view's column for it
    val gMap: Map[ExprId, Attribute] =
      gs.map(g => g.exprId -> vAttr(g.name).getOrElse(return None)).toMap

    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined) return None
      // COUNT(DISTINCT c) over a HELPER VIEW keyed by (…group cols…, c):
      // the view holds exactly one live row per (group, value) combination
      // (emptied cells are deleted when their cnt reaches 0), so the
      // distinct count is a plain COUNT of view rows per rolled-up group —
      // null-insensitive on both sides (SQL count(distinct) skips nulls;
      // the view excludes null-dimension rows). Any other DISTINCT
      // aggregate has no maintained decomposition.
      // the view GRAIN must be exactly (group keys + the distinct column):
      // a view keyed by (grp, day, u) answering GROUP BY grp with
      // count(DISTINCT u) would count live (day, u) CELLS, overcounting u
      // values that appear under several day cells — so any extra
      // dimension beyond the distinct column disqualifies the view.
      if (ae.isDistinct) return ae.aggregateFunction match {
        case c: Count => c.children match {
          case Seq(a: Attribute) if rollup && !gNames.contains(a.name) &&
              view.schema.dimNames.toSet == gNames + a.name &&
              view.schema.dimNames.size == gs.size + 1 =>
            vAttr(a.name).map { v =>
              val e: Expression = Count(Seq(v)).toAggregateExpression()
              if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
            }
          case _ => None
        }
        case _ => None
      }
      // exact grain: the view row IS the group — read the column.
      // rollup grain: re-aggregate the view's cells — sum/min/max are
      // decomposable, count(*)/count(col) are sums of per-cell counts.
      def col(prefix: String, c: Expression,
          roll: Attribute => AggregateFunction): Option[Expression] = c match {
        case a: Attribute =>
          vAttr(prefix + a.name).map { v =>
            val e: Expression =
              if (rollup) roll(v).toAggregateExpression() else v
            if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
          }
        case _ => None // no maintained column for this expression shape
      }
      // an EXPRESSION child matching a declared derived column reads that
      // column (re-aggregated like any column when the grain is coarser)
      def exprCol(prefix: String, c: Expression,
          roll: Attribute => AggregateFunction): Option[Expression] =
        declOf(c).flatMap(n => vAttr(prefix + n)).map { v =>
          val e: Expression =
            if (rollup) roll(v).toAggregateExpression() else v
          if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
        }
      ae.aggregateFunction match {
        case s: Sum   => col("sum_", s.child, Sum(_))
          .orElse(exprCol("sum_", s.child, Sum(_)))
        case m: Min   => col("min_", m.child, Min(_))
          .orElse(exprCol("min_", m.child, Min(_)))
        case m: Max   => col("max_", m.child, Max(_))
          .orElse(exprCol("max_", m.child, Max(_)))
        case c: Count => c.children match {
          case Seq(l: Literal) if l.value != null =>
            vAttr("cnt").map { v =>
              if (rollup) Cast(Sum(v).toAggregateExpression(), ae.dataType)
              else v
            }
          // COUNT(col) — non-null count: maintained as cnt_<col>, rolled
          // up as the sum of per-cell counts like cnt
          case Seq(child) =>
            col("cnt_", child, Sum(_)).orElse(exprCol("cnt_", child, Sum(_)))
          case _ => None
        }
        // AVG derives from the maintained pair (sum_c, cnt) by substituting
        // them into Spark's OWN Average.evaluateExpression — its aggregation
        // buffer is exactly (sum, count), so the division/overflow/precision
        // semantics are Spark's verbatim, not a reimplementation. Bit-exact
        // for DECIMAL (the buffer sum is a widened decimal; casting our
        // exact sum_c up is lossless) and for integral inputs within 2^53
        // (integer-valued double additions are order-free there).
        case a: Average => (a.child match {
          case c: Attribute => vAttr("sum_" + c.name)
          case c            => declOf(c).flatMap(n => vAttr("sum_" + n))
        }) match {
          case Some(sumAttr) =>
            for { s <- Some(sumAttr); n <- vAttr("cnt") } yield {
              val Seq(sumBuf, cntBuf) = a.aggBufferAttributes
              // rollup: the buffer values are themselves sums over cells
              // (sum-of-sums / sum-of-cnts) — the same decomposition the
              // partial-aggregation merge performs
              def sub(e: Expression, t: org.apache.spark.sql.types.DataType)
                  : Expression = {
                val v: Expression = if (rollup) Sum(e).toAggregateExpression() else e
                if (v.dataType == t) v else Cast(v, t)
              }
              a.evaluateExpression.transformUp {
                case x: Attribute if x.exprId == sumBuf.exprId => sub(s, sumBuf.dataType)
                case x: Attribute if x.exprId == cntBuf.exprId => sub(n, cntBuf.dataType)
              }
            }
          case None => None
        }
        case _ => None
      }
    }

    var ok = true
    val mapped = aggExprs.map { ne =>
      val e2 = ne.transformUp {
        case ae: AggregateExpression => mapAgg(ae).getOrElse { ok = false; ae }
        case a: Attribute if gMap.contains(a.exprId) => gMap(a.exprId)
      }
      e2 match {
        case al: Alias => al // withNewChildren keeps the original exprId
        case other     => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    if (!ok) return None
    val filtered = cond match {
      case Some(c) =>
        Filter(c.transformUp {
          case a: Attribute if gMap.contains(a.exprId) => gMap(a.exprId)
        }, vPlan)
      case None => vPlan
    }
    logInfo(s"graft mv-rewrite: answering aggregate over ${entry.baseRoot} " +
      s"from materialized view $viewRoot (txn ${entry.snapTxn}" +
      (if (rollup) ", rolled up" else "") + ")")
    Some(
      if (rollup) Aggregate(gs.map(g => gMap(g.exprId)), mapped, filtered)
      else Project(mapped, filtered))
  }
}
