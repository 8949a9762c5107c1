package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Evidence for round 12's storage-partitioned joins ([[graft.sources.GraftScan]]
  * reporting `KeyGroupedPartitioning` over chunk transforms): a fact-fact
  * join of two chunk-ALIGNED graft tables — the shape broadcast can never
  * rescue, where both sides otherwise pay a full shuffle — runs with ZERO
  * exchanges under `spark.sql.sources.v2.bucketing.enabled`, including the
  * MVCC dedup aggregates below the join. At 100 TB this is the difference
  * between moving both tables across the cluster and moving nothing.
  *
  * The probe builds two tables of `rows` rows each over an aligned chunk
  * grid (multi-version, so the dedup aggregates are real), then times the
  * join + aggregate with the conf off and on, recording shuffle bytes and
  * asserting the exchange-free plan.
  *
  * Usage: runMain graft.tools.SpjProbe [rows] → one JSON line +
  * bench/spj_probe.json. */
object SpjProbe {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(5000000L)
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

    val base = java.nio.file.Files.createTempDirectory("graft-spj-probe")
    spark.conf.set("spark.sql.catalog.gspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gspj.root", base.toString)
    // rows/100k chunks; two commits per table so the MVCC resolve has
    // versions to collapse and the per-chunk grouping spans segments
    Seq("a" -> 3L, "b" -> 7L).foreach { case (t, mult) =>
      spark.sql(s"CREATE TABLE gspj.$t (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES('graft.dims' = 'k:100000')")
      spark.sql(s"INSERT INTO gspj.$t SELECT id, id * $mult FROM range(0, $rows)")
      spark.sql(s"INSERT INTO gspj.$t SELECT id, id * $mult + 1 FROM range(0, ${rows / 2})")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def query(): DataFrame = spark.sql(
      """SELECT sum(a.v + b.v) AS s, count(*) AS n
        |FROM gspj.a a JOIN gspj.b b ON a.k = b.k""".stripMargin)

    def run(label: String, spj: Boolean): (Double, Long, String) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      query().collect() // warm (also builds file index)
      var best = Double.MaxValue
      var bytes = 0L
      (1 to 3).foreach { _ =>
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        query().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        bytes = shuffleBytes.get() - b0
      }
      val plan = query().queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      println(f"[probe] $label%-8s exchanges=$exchanges min=${best}%6.3f s shuffleBytes=$bytes")
      (best, bytes, s"$exchanges")
    }

    val off = run("spj_off", spj = false)
    val on = run("spj_on", spj = true)

    // round 13: COMPATIBLE chunk sizes — table c is chunked at HALF a's
    // size; ChunkFunction's reducer regroups c's partitions to a's
    // transform (allowCompatibleTransforms), so the mixed-layout join is
    // exchange-free too (minus the constant 1-row gather)
    spark.sql("CREATE TABLE gspj.c (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.dims' = 'k:50000')")
    spark.sql(s"INSERT INTO gspj.c SELECT id, id * 11 FROM range(0, $rows)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
    val regroup = {
      def q(): DataFrame = spark.sql(
        """SELECT sum(a.v + c.v) AS s, count(*) AS n
          |FROM gspj.a a JOIN gspj.c c ON a.k = c.k""".stripMargin)
      q().collect()
      var best = Double.MaxValue
      var bytes = 0L
      (1 to 3).foreach { _ =>
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        q().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        bytes = shuffleBytes.get() - b0
      }
      val plan = q().queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      println(f"[probe] regroup  exchanges=$exchanges min=${best}%6.3f s shuffleBytes=$bytes")
      require(exchanges <= 1 && bytes < 100_000,
        s"cross-chunk-size SPJ must regroup, not shuffle: exchanges=$exchanges bytes=$bytes")
      (best, bytes, s"$exchanges")
    }

    // the one exchange left under SPJ is the final 1-row scalar aggregate's
    // partial->final gather — constant bytes at ANY table size; the
    // data-volume exchanges (both dedup aggregates + the join) are gone
    require(on._3.toInt <= 1 && on._3.toInt < off._3.toInt,
      s"SPJ must remove the data exchanges: ${off._3} -> ${on._3}")
    require(off._2 > 10_000_000 && on._2 < 100_000,
      s"SPJ must reduce shuffle to constant gather bytes: ${off._2} -> ${on._2}")

    val json =
      s"""{"metric":"spj_probe","rows":$rows,
         |"spj_off":{"exchanges":${off._3},"sec":${off._1},"shuffle_bytes":${off._2}},
         |"spj_on":{"exchanges":${on._3},"sec":${on._1},"shuffle_bytes":${on._2}},
         |"regroup_50k_vs_100k":{"exchanges":${regroup._3},"sec":${regroup._1},"shuffle_bytes":${regroup._2}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "spj_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    graft.core.Storage.deleteRecursively(base)
    spark.stop()
  }
}
