package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Evidence for round 12's DSv2 `columnStats` ([[graft.sources.GraftCatalog]]
  * `GraftStatsScan`): ANALYZE's per-dimension NDV/min/max now reach
  * Catalyst's `attributeStats`, so CBO join REORDER can tell an EXPANDING
  * join from a SELECTIVE one — previously it ran blind on bytes and kept
  * the written order.
  *
  * Shape: fact (5M rows) ⋈ d1 (10k rows, 1k distinct k1 → ×10 expansion)
  * ⋈ d2 (10 rows covering 10 of fact's 50 k2 values → 5× row cut). Written
  * order joins d1 first: the second join shuffles a ~50M-row intermediate.
  * Cost-based order joins d2 first: the intermediate is ~1M rows. With
  * broadcasts disabled (the 100 TB regime where dims exceed the
  * threshold), the shuffled-intermediate delta is the measured win; the
  * flip itself is asserted structurally on the innermost join's tables.
  *
  * Usage: runMain graft.tools.CboProbe [factRows] → one JSON line +
  * bench/cbo_probe.json. */
object CboProbe {

  def main(args: Array[String]): Unit = {
    val factRows = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val base = java.nio.file.Files.createTempDirectory("graft-cbo-probe")
    spark.conf.set("spark.sql.catalog.gcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbo.root", base.toString)

    spark.sql("CREATE TABLE gcbo.fact (k1 BIGINT, k2 BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.dims' = 'k1:1000000,k2:1000000')")
    spark.sql("INSERT INTO gcbo.fact SELECT id % 1000, " +
      s"CAST(id / 1000 AS BIGINT) % 50, id FROM range(0, $factRows)")
    spark.sql("CREATE TABLE gcbo.d1 (k1 BIGINT, seq BIGINT, a BIGINT) " +
      "TBLPROPERTIES('graft.dims' = 'k1:1000000,seq:1000000')")
    spark.sql("INSERT INTO gcbo.d1 SELECT id % 1000, CAST(id / 1000 AS BIGINT), id " +
      "FROM range(0, 10000)")
    spark.sql("CREATE TABLE gcbo.d2 (k2 BIGINT, b BIGINT) " +
      "TBLPROPERTIES('graft.dims' = 'k2:1000000')")
    spark.sql("INSERT INTO gcbo.d2 SELECT id, id * 7 FROM range(0, 10)")
    Seq("fact", "d1", "d2").foreach(t => spark.sql(s"CALL gcbo.system.analyze('$t')"))

    // the 100 TB regime: dims above the broadcast threshold — join order is
    // the only lever on how many intermediate rows cross the wire
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def query(): DataFrame = spark.sql(
      """SELECT sum(f.v + d1.a + d2.b) AS s FROM gcbo.fact f
        |JOIN gcbo.d1 d1 ON f.k1 = d1.k1
        |JOIN gcbo.d2 d2 ON f.k2 = d2.k2""".stripMargin)

    def innermostTables(df: DataFrame): Set[String] = {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      joins.filter(j => j.children.forall(c =>
          c.collect { case jj: Join => jj }.isEmpty))
        .flatMap(_.collectLeaves().collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.relation.table.name()
        }).toSet
    }

    def run(label: String, cbo: Boolean): (Double, Long, Set[String]) = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      query().collect() // warm
      var best = Double.MaxValue
      var bytes = 0L
      (1 to 3).foreach { _ =>
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        query().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        bytes = shuffleBytes.get() - b0
      }
      val inner = innermostTables(query())
      println(f"[probe] $label%-8s inner=${inner.mkString(",")}%-30s min=${best}%6.3f s shuffleBytes=$bytes")
      (best, bytes, inner)
    }

    val off = run("cbo_off", cbo = false)
    val on = run("cbo_on", cbo = true)

    require(off._3.exists(_.contains("d1")),
      s"without CBO the written (expanding-first) order must stand: ${off._3}")
    require(on._3.exists(_.contains("d2")) && !on._3.exists(_.contains("d1")),
      s"CBO must reorder the selective d2 join innermost: ${on._3}")
    require(on._2 * 2 < off._2,
      s"reordered plan must shuffle less than half the bytes: ${on._2} vs ${off._2}")

    val json =
      s"""{"metric":"cbo_probe","fact_rows":$factRows,
         |"cbo_off":{"inner_join":"${off._3.mkString(",")}","sec":${off._1},"shuffle_bytes":${off._2}},
         |"cbo_on":{"inner_join":"${on._3.mkString(",")}","sec":${on._1},"shuffle_bytes":${on._2}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "cbo_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    spark.stop()
  }
}
