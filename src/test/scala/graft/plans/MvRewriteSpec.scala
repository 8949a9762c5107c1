package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.operators.IncrementalAgg

/** Materialized-view auto-rewrite (MvRewriteRule): a GROUP BY over a
  * registered base snapshot is answered from the maintained view — and ONLY
  * when every soundness check holds. Results must be identical either way;
  * the rewrite may change plans, never answers. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val baseSchema = MatSchema(
    Seq(Dimension("event_id", 100)),
    Seq(ValueCol("grp"), ValueCol("v")))

  /** Root paths of every parquet relation the (logical) plan scans. */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def fixture(tag: String): (MatDb, MatDb, String, String) = {
    val root = Files.createTempDirectory(s"graft-mv-$tag")
    val basePath = root.resolve("base").toString
    val viewPath = root.resolve("view").toString
    val base = MatDb.create(spark, baseSchema, basePath, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("sum_v"), ValueCol("cnt"))), viewPath, "manifest")
    (base, view, basePath, viewPath)
  }

  private def seedAndMaintain(base: MatDb, view: MatDb, groupCol: String = "grp"): Unit = {
    // txn 1: 60 rows in 6 groups; txn 2: updates for half; txn 3: deletes
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i * 10L))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, groupCol)
    val t2 = base.newTransaction()
    t2.addRowsSeq(for (i <- 0L until 30L) yield Seq[Any](i, i % 6, i * 10L + 1L))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 2L, groupCol)
    val t3 = base.newTransaction()
    t3.deleteRows(spark.createDataFrame(
      spark.sparkContext.parallelize((40L until 50L).map(i => org.apache.spark.sql.Row(i))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType)))))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 2L, 3L, groupCol)
  }

  test("sum/count GROUP BY over a registered snapshot reads ONLY the view") {
    val (base, view, basePath, viewPath) = fixture("basic")
    seedAndMaintain(base, view)
    base.registerMaterializedView(viewPath)

    def q = base.snapshot().groupBy("grp")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"), avg("v").as("avg_v"))

    val rewritten = q
    val roots = scanRoots(rewritten)
    assert(roots.nonEmpty && roots.forall(_.contains("/view/")),
      s"expected only view scans, got $roots")

    // ground truth: same query with the rewrite disabled
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val plain =
      try q
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(scanRoots(plain).exists(_.contains("/base/")), "kill switch ignored")
    assert(rewritten.orderBy("grp").collect().toSeq ===
      plain.orderBy("grp").collect().toSeq)
    assert(rewritten.count() === 6)
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("group-column filter rides the rewrite; value filters do not") {
    val (base, view, _, viewPath) = fixture("filter")
    seedAndMaintain(base, view)
    base.registerMaterializedView(viewPath)

    val filtered = base.snapshot().where(col("grp") < 3)
      .groupBy("grp").agg(sum("v").as("sum_v"))
    assert(scanRoots(filtered).forall(_.contains("/view/")))
    assert(filtered.count() === 3)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val expected =
      try filtered.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(filtered.orderBy("grp").collect().toSeq === expected)

    // a predicate on a VALUE column must see base rows — no rewrite
    val valueFiltered = base.snapshot().where(col("v") > 100L)
      .groupBy("grp").agg(sum("v").as("sum_v"))
    assert(scanRoots(valueFiltered).exists(_.contains("/base/")))
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("staleness, distinct aggregates, asOf, and foreign views never rewrite") {
    val (base, view, _, viewPath) = fixture("guards")
    seedAndMaintain(base, view)
    base.registerMaterializedView(viewPath)

    // distinct aggregate: no maintained column can answer it
    val d = base.snapshot().groupBy("grp").agg(countDistinct("v").as("dv"))
    assert(scanRoots(d).exists(_.contains("/base/")))

    // sum over an expression: not maintained
    val e = base.snapshot().groupBy("grp").agg(sum(col("v") + 1L).as("s"))
    assert(scanRoots(e).exists(_.contains("/base/")))

    // time travel at an ALIGNED txn (a maintenance batch ended exactly
    // there) rewrites to the view's pinned version — and answers the
    // HISTORICAL aggregate, not the current one (see the dedicated
    // VERSION AS OF test for the full matrix)
    val t = base.asOf(2L).groupBy("grp").agg(sum("v").as("sum_v"))
    assert(scanRoots(t).forall(_.contains("/view/")))

    // stale: one more base commit, view not maintained -> fresh snapshot
    // reads the base (and returns the NEW rows the view lacks)
    val t4 = base.newTransaction()
    t4.addRowsSeq(Seq(Seq[Any](1000L, 99L, 5L)))
    t4.commit()
    val stale = base.snapshot().groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(scanRoots(stale).exists(_.contains("/base/")))
    assert(stale.where(col("grp") === 99L).count() === 1)
    // catch the view back up -> rewrite resumes
    IncrementalAgg.maintainAbsoluteMulti(base, view, 3L, 4L, "grp")
    val fresh = base.snapshot().groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(scanRoots(fresh).forall(_.contains("/view/")))
    assert(fresh.where(col("grp") === 99L).count() === 1)
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("a composite-key view answers GROUP BY in any column order") {
    val root = Files.createTempDirectory("graft-mv-multi")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("src"), ValueCol("v"))),
      root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(
      Seq(Dimension("grp", 1000), Dimension("src", 10)),
      Seq(ValueCol("sum_v"), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i % 3, i))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 0L, 1L, Seq("grp", "src"))
    base.registerMaterializedView(root.resolve("view").toString)

    // GROUP BY in the REVERSE of the view's dimension order still rewrites
    val q = base.snapshot().groupBy("src", "grp")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
    assert(scanRoots(q).nonEmpty && scanRoots(q).forall(_.contains("/view/")))
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val plain =
      try q.orderBy("src", "grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(q.orderBy("src", "grp").collect().toSeq === plain)

    // a SUBSET of the key (coarser rollup) re-aggregates the VIEW:
    // sum-of-sums / sum-of-cnts (avg dividing the two) — still O(view)
    val coarse = base.snapshot().groupBy("grp")
      .agg(sum("v").as("s"), count(lit(1)).as("cnt"), avg("v").as("a"))
    assert(scanRoots(coarse).nonEmpty &&
      scanRoots(coarse).forall(_.contains("/view/")),
      s"rollup should read the view, got ${scanRoots(coarse)}")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val coarsePlain =
      try coarse.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(coarse.orderBy("grp").collect().toSeq === coarsePlain)

    // min/max also roll up (min of per-cell minima); a column the view
    // does not maintain still blocks the rewrite
    val noMin = base.snapshot().groupBy("grp").agg(min("v").as("m"))
    assert(scanRoots(noMin).exists(_.contains("/base/")),
      "this view maintains no min_v — a rollup cannot invent it")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("decimal AVG rewrites bit-exactly through Spark's own Average semantics") {
    import org.apache.spark.sql.types.DecimalType
    val root = Files.createTempDirectory("graft-mv-avg")
    val dec = DecimalType(18, 4)
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("v", dec))),
      root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("sum_v", dec), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    val t1 = base.newTransaction()
    t1.addRows(spark.range(0, 90).select(col("id").as("event_id"),
      (col("id") % 9).as("grp"),
      ((col("id") * 7 + 1).cast("decimal(18,4)") / lit(3)).cast(dec).as("v")))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "grp")
    base.registerMaterializedView(root.resolve("view").toString)
    val q = base.snapshot().groupBy("grp").agg(avg("v").as("a"))
    assert(scanRoots(q).nonEmpty && scanRoots(q).forall(_.contains("/view/")))
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val plain =
      try q.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    val rewritten = q.orderBy("grp").collect().toSeq
    assert(rewritten === plain) // BigDecimal equality: scale + value
    assert(rewritten.head.schema("a").dataType === plain.head.schema("a").dataType)
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("the SQL catalog read path rewrites too (through the SubqueryAlias)") {
    val croot = Files.createTempDirectory("graft-mv-sqlcat")
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.root", croot.toString)
    // base table lives at <catalogRoot>/t — created directly, read via SQL
    val base = MatDb.create(spark, baseSchema, croot.resolve("t").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("sum_v"), ValueCol("cnt"))),
      croot.resolve("t_view").toString, "manifest")
    seedAndMaintain(base, view)
    base.registerMaterializedView(croot.resolve("t_view").toString)

    def q = spark.sql(
      "SELECT grp, sum(v) AS sum_v, count(*) AS cnt FROM gmv.t GROUP BY grp")
    val roots = scanRoots(q)
    assert(roots.nonEmpty && roots.forall(_.contains("t_view")),
      s"expected only view scans on the SQL path, got $roots")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val plain =
      try q.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(q.orderBy("grp").collect().toSeq === plain)

    // SQL filter on the group column rides along; VERSION AS OF at an
    // ALIGNED maintenance txn rewrites to the view's pinned version too
    // (round 15 — the dedicated SQL-VERSION-AS-OF test pins aligned vs
    // mid-batch and value equality)
    val f = spark.sql(
      "SELECT grp, sum(v) AS s FROM gmv.t WHERE grp < 3 GROUP BY grp")
    assert(scanRoots(f).forall(_.contains("t_view")) && f.count() === 3)
    val tt = spark.sql(
      "SELECT grp, sum(v) AS s FROM gmv.t VERSION AS OF 2 GROUP BY grp")
    assert(scanRoots(tt).nonEmpty && scanRoots(tt).forall(_.contains("t_view")),
      "an aligned time-travel catalog read rewrites to the view's pinned version")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("min/max views rewrite; a view of another table never hijacks") {
    val root = Files.createTempDirectory("graft-mv-minmax")
    val base = MatDb.create(spark, baseSchema, root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("min_v"), ValueCol("max_v"), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    seedAndMaintain(base, view)
    base.registerMaterializedView(root.resolve("view").toString)

    val q = base.snapshot().groupBy("grp")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("cnt"))
    assert(scanRoots(q).forall(_.contains("/view/")))
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val expected =
      try q.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(q.orderBy("grp").collect().toSeq === expected)

    // sum is NOT maintained by this view -> no rewrite
    val s = base.snapshot().groupBy("grp").agg(sum("v").as("s"))
    assert(scanRoots(s).exists(_.contains("/base/")))

    // a second base declaring the SAME view path: stamp names the first
    // base, so the foreign declaration never fires
    val other = MatDb.create(spark, baseSchema, root.resolve("other").toString, "manifest")
    val to = other.newTransaction()
    to.addRowsSeq(for (i <- 0L until 6L) yield Seq[Any](i, i % 6, i))
    to.commit()
    // put other's watermark at the view's stamped txn to tempt the matcher
    val t2 = other.newTransaction()
    t2.addRowsSeq(Seq(Seq[Any](100L, 0L, 0L))); t2.commit()
    val t3 = other.newTransaction()
    t3.addRowsSeq(Seq(Seq[Any](101L, 0L, 0L))); t3.commit()
    other.registerMaterializedView(root.resolve("view").toString)
    val oq = other.snapshot().groupBy("grp").agg(count(lit(1)).as("cnt"))
    assert(scanRoots(oq).exists(_.contains("/other/")))
    assert(oq.count() === 6)
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
    MvRegistry.dropRoot(other.root.toAbsolutePath.toString)
  }

  test("declared EXPRESSION aggregates maintain and rewrite (sum(a*b)-style)") {
    val root = Files.createTempDirectory("graft-mv-expr")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("w"), ValueCol("v"))),
      root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("sum_rev"), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    // the derived column: rev = v * (w + 1), declared on the VIEW
    Storage.writeProps(view.root, Storage.readProps(view.root) +
      ("graft.mview.expr.rev" -> "v * (w + 1)"))
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i % 7, i + 1))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "grp")
    // update moves BOTH expression inputs (v and w) for half the keys
    val t2 = base.newTransaction()
    t2.addRowsSeq(for (i <- 0L until 30L) yield Seq[Any](i, i % 6, (i + 1) % 7, i + 100L))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 2L, "grp")
    val t3 = base.newTransaction()
    t3.deleteRows(spark.range(40, 50).select(col("id").as("event_id")))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 2L, 3L, "grp")
    base.registerMaterializedView(root.resolve("view").toString)

    def truth(df: DataFrame): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try df.orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }
    // sum over the declared expression rewrites and matches a recompute
    val q = base.snapshot().groupBy("grp")
      .agg(sum(col("v") * (col("w") + 1L)).as("rev"), count(lit(1)).as("cnt"))
    assert(scanRoots(q).forall(_.contains("/view/")),
      s"expression sum must rewrite; scans ${scanRoots(q)}")
    assert(q.orderBy("grp").collect().toSeq === truth(q))
    // commuted operand order canonicalizes to the same declaration
    val qc = base.snapshot().groupBy("grp")
      .agg(sum((col("w") + 1L) * col("v")).as("rev"))
    assert(scanRoots(qc).forall(_.contains("/view/")), "commuted form must match")
    assert(qc.orderBy("grp").collect().toSeq === truth(qc))
    // AVG over the expression derives from (sum_rev, cnt)
    val qa = base.snapshot().groupBy("grp")
      .agg(avg(col("v") * (col("w") + 1L)).as("a"))
    assert(scanRoots(qa).forall(_.contains("/view/")), "expression avg must rewrite")
    assert(qa.orderBy("grp").collect().toSeq === truth(qa))
    // an UNDECLARED expression falls through to the base
    val qx = base.snapshot().groupBy("grp")
      .agg(sum(col("v") * (col("w") + 2L)).as("rev"))
    assert(scanRoots(qx).exists(_.contains("/base/")),
      "an undeclared expression must never rewrite")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("VERSION AS OF rewrites at aligned txns, falls back at mid-batch txns") {
    val (base, view, _, viewPath) = fixture("asof")
    // txn 1 maintained alone; txns 2+3 maintained as ONE range (2, 3] —
    // the view has pinned versions at 1 and 3, but NOT at 2
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i * 10L))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "grp")
    val t2 = base.newTransaction()
    t2.addRowsSeq(for (i <- 0L until 30L) yield Seq[Any](i, i % 6, i * 10L + 1L))
    t2.commit()
    val t3 = base.newTransaction()
    t3.addRowsSeq(Seq(Seq[Any](1000L, 99L, 7L)))
    t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 3L, "grp")
    base.registerMaterializedView(viewPath)

    def agg(df: DataFrame) = df.groupBy("grp")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
    def truth(df: DataFrame) = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try agg(df).orderBy("grp").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }

    // aligned historical txn 1: rewrites AND answers the txn-1 aggregate
    val q1 = agg(base.asOf(1L))
    assert(scanRoots(q1).forall(_.contains("/view/")),
      "asOf at an aligned maintenance txn must rewrite to the view")
    assert(q1.orderBy("grp").collect().toSeq === truth(base.asOf(1L)))
    assert(q1.where(col("grp") === 99L).count() === 0,
      "the historical rewrite must not leak current-state rows")

    // mid-batch txn 2: the view has no pinned version there -> base scan
    val q2 = agg(base.asOf(2L))
    assert(scanRoots(q2).exists(_.contains("/base/")),
      "asOf at a mid-batch txn must fall back to the base")
    assert(q2.orderBy("grp").collect().toSeq === truth(base.asOf(2L)))

    // current snapshot (== txn 3, the stamp) still rewrites
    val q3 = agg(base.snapshot())
    assert(scanRoots(q3).forall(_.contains("/view/")))
    assert(q3.where(col("grp") === 99L).count() === 1)

    // a view that ADVANCED PAST a registered snapshot serves it from its
    // aligned version: register the txn-3 snapshot, advance base+view to
    // txn 4, the OLD snapshot's aggregate still rewrites (pinned read)
    val snap3 = base.snapshot()
    val t4 = base.newTransaction()
    t4.addRowsSeq(Seq(Seq[Any](1001L, 98L, 9L))); t4.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 3L, 4L, "grp")
    val q3b = agg(snap3)
    assert(scanRoots(q3b).forall(_.contains("/view/")),
      "an advanced view must still serve the older snapshot via its aligned version")
    assert(q3b.where(col("grp") === 98L).count() === 0)
    assert(q3b.orderBy("grp").collect().toSeq === truth(base.asOf(3L)))
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("the alignment witness trusts pinned history only AT OR BELOW the stamp") {
    val (base, view, _, viewPath) = fixture("forge")
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 12L) yield Seq[Any](i, i % 3, i))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "grp") // stamp txn = 1
    base.registerMaterializedView(viewPath)
    // compact() on a maintained view is REFUSED outright: it would
    // self-allocate watermark+1 — the base's next txn id — hijacking the
    // pinned maintenance clock and forging the witness
    val e = intercept[IllegalArgumentException](view.compact())
    assert(e.getMessage.contains("maintained view"))
    // simulate the forgery anyway (an out-of-band writer pinning the
    // view's next id): the view now HAS a commit exactly at txn 2, but the
    // stamp only vouches through txn 1 — a base snapshot at txn 2 must
    // fall back to the base, not read pre-txn-2 aggregates from the view
    val rogue = view.newPinnedTransaction(2L)
    rogue.addRowsSeq(Seq(Seq[Any](0L, 999L, 1L))) // (grp, sum_v, cnt)
    rogue.commit()
    assert(view.hasCommitExactlyAt(2L), "forgery precondition")
    val t2 = base.newTransaction()
    t2.addRowsSeq(Seq(Seq[Any](100L, 0L, 7L))); t2.commit() // base txn 2
    val q = base.snapshot().groupBy("grp").agg(sum("v").as("s"))
    assert(scanRoots(q).exists(_.contains("/base/")),
      "snapTxn above the stamp must never rewrite (forged witness)")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("count(col) rewrites via cnt_<col> at exact grain and rolls up as a sum") {
    val root = Files.createTempDirectory("graft-mv-cntcol")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("src"), ValueCol("w"))),
      root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(
      Seq(Dimension("grp", 1000), Dimension("src", 10)),
      Seq(ValueCol("cnt_w"), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    // w NULLABLE: count(w) != count(*) — exactly what cnt_w maintains
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield
      Seq[Any](i, i % 6, i % 3, if (i % 4 == 0) null else i))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 0L, 1L, Seq("grp", "src"))
    base.registerMaterializedView(root.resolve("view").toString)
    def truth(df: DataFrame) = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try df.collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }
    // exact grain: count(w) reads cnt_w verbatim
    val q = base.snapshot().groupBy("grp", "src")
      .agg(count(col("w")).as("cw"), count(lit(1)).as("c")).orderBy("grp", "src")
    assert(scanRoots(q).nonEmpty && scanRoots(q).forall(_.contains("/view/")),
      s"count(col) must rewrite, got ${scanRoots(q)}")
    assert(q.collect().toSeq === truth(q))
    // rollup grain: count(w) = sum of per-cell cnt_w
    val qr = base.snapshot().groupBy("grp")
      .agg(count(col("w")).as("cw")).orderBy("grp")
    assert(scanRoots(qr).forall(_.contains("/view/")), "rollup count(col)")
    assert(qr.collect().toSeq === truth(qr))
    // fallback: a column with no maintained cnt_ goes to the base
    val qx = base.snapshot().groupBy("grp", "src").agg(count(col("event_id")).as("ce"))
    assert(scanRoots(qx).exists(_.contains("/base/")),
      "count of an unmaintained column must not rewrite")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("count(DISTINCT d) rewrites over a (group, d) helper view as a row count") {
    val root = Files.createTempDirectory("graft-mv-cd")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("user_id"))),
      root.resolve("base").toString, "manifest")
    // the helper view: keyed by (grp, user_id), one live row per live
    // combination (cnt reaching 0 deletes the cell)
    val helper = MatDb.create(spark, MatSchema(
      Seq(Dimension("grp", 1000), Dimension("user_id", 1000)),
      Seq(ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i % 10))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, helper, 0L, 1L, Seq("grp", "user_id"))
    // churn: k0 moves to user 999 (new distinct value in grp 0); delete
    // every row of user 5 (may empty (grp, 5) cells)
    val t2 = base.newTransaction()
    t2.addRowsSeq(Seq(Seq[Any](0L, 0L, 999L)))
    t2.deleteRows(spark.range(0, 60).where(col("id") % 10 === 5)
      .select(col("id").as("event_id")))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, helper, 1L, 2L, Seq("grp", "user_id"))
    base.registerMaterializedView(root.resolve("view").toString)
    def truth(df: DataFrame) = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try df.collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }
    val q = base.snapshot().groupBy("grp")
      .agg(countDistinct(col("user_id")).as("u")).orderBy("grp")
    assert(scanRoots(q).nonEmpty && scanRoots(q).forall(_.contains("/view/")),
      s"count(distinct) must rewrite over the helper view, got ${scanRoots(q)}")
    assert(q.collect().toSeq === truth(q))
    // count(DISTINCT grp) grouped by grp (the distinct column IS a group
    // column) has no helper decomposition here — falls back
    val qx = base.snapshot().groupBy("grp").agg(countDistinct(col("grp")).as("g"))
    assert(scanRoots(qx).exists(_.contains("/base/")))
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("count(DISTINCT d) refuses a helper view with EXTRA dimensions") {
    // view keyed by (grp, day, user_id): counting its live rows per grp
    // counts (day, user_id) CELLS — a user active on several days would be
    // counted once per day. The rewrite must require the view grain to be
    // exactly (group keys + distinct column) and fall back to the base here.
    val root = Files.createTempDirectory("graft-mv-cdx")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("day"), ValueCol("user_id"))),
      root.resolve("base").toString, "manifest")
    val helper = MatDb.create(spark, MatSchema(
      Seq(Dimension("grp", 1000), Dimension("day", 1000),
        Dimension("user_id", 1000)),
      Seq(ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    val t1 = base.newTransaction()
    // user u = i % 5 appears under day = i % 3: every user spans all 3 days
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 2, i % 3, i % 5))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, helper, 0L, 1L,
      Seq("grp", "day", "user_id"))
    base.registerMaterializedView(root.resolve("view").toString)
    val q = base.snapshot().groupBy("grp")
      .agg(countDistinct(col("user_id")).as("u")).orderBy("grp")
    assert(scanRoots(q).exists(_.contains("/base/")),
      s"over-grain helper view must NOT serve count(distinct): ${scanRoots(q)}")
    // and the answer is the true distinct count (5 users per grp), not the
    // 15 (day, user) cells the bad rewrite would have counted
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 5L), (1L, 5L)))
    // the exact-grain rollup still rewrites: GROUP BY (grp, day) counting
    // DISTINCT user_id over the (grp, day, user_id) view
    val q2 = base.snapshot().groupBy("grp", "day")
      .agg(countDistinct(col("user_id")).as("u"))
    assert(scanRoots(q2).nonEmpty && scanRoots(q2).forall(_.contains("/view/")),
      s"exact-grain count(distinct) must still rewrite, got ${scanRoots(q2)}")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val truth2 =
      try q2.orderBy("grp", "day").collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(q2.orderBy("grp", "day").collect().toSeq === truth2)
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("declared EXPRESSION min/max rewrite like columns (and roll up)") {
    val root = Files.createTempDirectory("graft-mv-xmm")
    val base = MatDb.create(spark, MatSchema(Seq(Dimension("event_id", 100)),
      Seq(ValueCol("grp"), ValueCol("src"), ValueCol("w"), ValueCol("v"))),
      root.resolve("base").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(
      Seq(Dimension("grp", 1000), Dimension("src", 10)),
      Seq(ValueCol("min_rev"), ValueCol("max_rev"), ValueCol("cnt"))),
      root.resolve("view").toString, "manifest")
    Storage.writeProps(view.root, Storage.readProps(view.root) +
      ("graft.mview.expr.rev" -> "v * (w + 1)"))
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i % 3, i % 7, i + 1))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 0L, 1L, Seq("grp", "src"))
    // retire extremes (the dirty path) before asserting rewrite equality
    val t2 = base.newTransaction()
    t2.addRowsSeq(for (i <- 0L until 20L) yield Seq[Any](i, i % 6, i % 3, (i + 1) % 7, 1000L - i))
    t2.commit()
    IncrementalAgg.maintainAbsoluteMultiKeys(base, view, 1L, 2L, Seq("grp", "src"))
    base.registerMaterializedView(root.resolve("view").toString)
    def truth(df: DataFrame) = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try df.collect().toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }
    val q = base.snapshot().groupBy("grp", "src")
      .agg(min(col("v") * (col("w") + 1L)).as("mn"),
        max(col("v") * (col("w") + 1L)).as("mx")).orderBy("grp", "src")
    assert(scanRoots(q).nonEmpty && scanRoots(q).forall(_.contains("/view/")),
      s"expression min/max must rewrite, got ${scanRoots(q)}")
    assert(q.collect().toSeq === truth(q))
    // rollup: min of per-cell minima / max of per-cell maxima
    val qr = base.snapshot().groupBy("grp")
      .agg(min(col("v") * (col("w") + 1L)).as("mn"),
        max(col("v") * (col("w") + 1L)).as("mx")).orderBy("grp")
    assert(scanRoots(qr).forall(_.contains("/view/")), "expression extrema rollup")
    assert(qr.collect().toSeq === truth(qr))
    // an undeclared expression falls through
    val qx = base.snapshot().groupBy("grp", "src")
      .agg(min(col("v") * (col("w") + 2L)).as("mn"))
    assert(scanRoots(qx).exists(_.contains("/base/")))
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("SQL VERSION AS OF rewrites at aligned txns and falls back mid-batch (catalog path)") {
    val root = Files.createTempDirectory("graft-mv-sqlasof")
    val base = MatDb.create(spark, baseSchema,
      root.resolve("b").toString, "manifest")
    val view = MatDb.create(spark, MatSchema(Seq(Dimension("grp", 1000)),
      Seq(ValueCol("sum_v"), ValueCol("cnt"))),
      root.resolve("bview").toString, "manifest")
    // txn 1 maintained alone; txns 2+3 maintained as ONE range — the view
    // has pinned versions at 1 and 3, not at 2
    val t1 = base.newTransaction()
    t1.addRowsSeq(for (i <- 0L until 60L) yield Seq[Any](i, i % 6, i * 10L))
    t1.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 0L, 1L, "grp")
    val t2 = base.newTransaction()
    t2.addRowsSeq(Seq(Seq[Any](1000L, 99L, 7L))); t2.commit()
    val t3 = base.newTransaction()
    t3.addRowsSeq(Seq(Seq[Any](1001L, 98L, 9L))); t3.commit()
    IncrementalAgg.maintainAbsoluteMulti(base, view, 1L, 3L, "grp")
    base.registerMaterializedView(root.resolve("bview").toString)
    val cat = "g15sqlasof"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    def q(version: Long) = spark.sql(
      s"SELECT grp, sum(v) AS s, count(*) AS c FROM $cat.b VERSION AS OF $version " +
        "GROUP BY grp ORDER BY grp")
    // aligned txn 1: the SQL time-travel read is answered from the view's
    // pinned version (a rewritten plan reads the view as a parquet
    // LogicalRelation; an unrewritten one stays a DSv2 scan — scanRoots
    // empty), and the txn-1 answers are exact
    val q1 = q(1L)
    assert(scanRoots(q1).nonEmpty && scanRoots(q1).forall(_.contains("/bview/")),
      s"SQL VERSION AS OF at an aligned txn must rewrite: ${scanRoots(q1)}")
    val rows1 = q1.collect()
    assert(rows1.map(_.getLong(0)).toSeq === (0L until 6L))
    assert(!rows1.exists(_.getLong(0) == 99L), "txn-2 rows must not leak into txn 1")
    // mid-batch txn 2: no pinned view version — the DSv2 base scan answers
    val q2 = q(2L)
    assert(scanRoots(q2).isEmpty,
      s"a mid-batch txn must fall back to the DSv2 base scan: ${scanRoots(q2)}")
    assert(q2.collect().exists(_.getLong(0) == 99L))
    // aligned txn 3 rewrites again
    assert(scanRoots(q(3L)).nonEmpty && scanRoots(q(3L)).forall(_.contains("/bview/")))
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }

  test("registry is LRU (recent snapshots stay rewritable); dropped views free handles") {
    val (base, view, _, viewPath) = fixture("lru")
    seedAndMaintain(base, view)
    base.registerMaterializedView(viewPath)
    val q0 = base.snapshot().groupBy("grp").agg(sum("v").as("s"))
    assert(scanRoots(q0).forall(_.contains("/view/")), "baseline rewrite")

    // flood the registry with 300 foreign registrations: the RECENTLY USED
    // entry must survive LRU eviction (cap-and-clear would drop it)
    val snap = base.snapshot() // registers + is the entry we keep using
    (1 to 300).foreach { i =>
      MvRegistry.register(
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            s"c$i", org.apache.spark.sql.types.LongType)()),
        MvRegistry.Entry(s"/nowhere/$i", i.toLong, Seq(s"/nowhere/$i/view")))
      if (i % 50 == 0) // keep OUR entry warm mid-flood
        assert(scanRoots(snap.groupBy("grp").agg(sum("v").as("s")))
          .forall(_.contains("/view/")), s"evicted after $i foreign registrations")
    }
    assert(scanRoots(snap.groupBy("grp").agg(sum("v").as("s")))
      .forall(_.contains("/view/")), "the most-recently-used entry must survive")

    // dropping the view frees its cached handle; the next query falls
    // through to the base (handle gone, stamp gone with the deleted dir)
    assert(MvRegistry.hasHandle(java.nio.file.Paths.get(viewPath)
      .toAbsolutePath.toString))
    base.unregisterMaterializedView(viewPath)
    assert(!MvRegistry.hasHandle(java.nio.file.Paths.get(viewPath)
      .toAbsolutePath.toString), "unregister must drop the view handle")
    val after = base.snapshot().groupBy("grp").agg(sum("v").as("s"))
    assert(scanRoots(after).exists(_.contains("/base/")),
      "after unregister the query must fall through to the base")
    MvRegistry.dropRoot(base.root.toAbsolutePath.toString)
  }
}
