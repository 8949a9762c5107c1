package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dimension, MatDb, MatSchema, ValueCol}

/** Evidence for round 11's ANALYZE statistics ([[graft.core.MatDb.analyze]]):
  * raw on-disk bytes price EVERY MVCC version, so a hot-update dimension
  * table with `versions` versions per key looks `versions`× its resolved
  * size — above the broadcast threshold, even though the relation a join
  * actually consumes (post-resolve) is small. The probe runs a 3-table
  * star join (fact ⋈ hot-dim ⋈ cold-dim) twice:
  *
  *   - `no_stats`: raw pricing — the hot dim exceeds the threshold, the
  *     plan degrades to sort-merge and the FACT side is exchanged;
  *   - `analyzed`: after `analyze()` — resolved pricing broadcasts both
  *     dims, the fact side never moves.
  *
  * Structural signals (join operators chosen, shuffle bytes) are
  * deterministic; timings are steal-hostage (min-of-3). At 100 TB the
  * delta is the fact-table shuffle. Usage:
  * runMain graft.tools.StatsProbe [dimKeys] [versions] [factRows]
  * → one JSON line + bench/stats_probe.json. */
object StatsProbe {

  def main(args: Array[String]): Unit = {
    val dimKeys = args.lift(0).map(_.toLong).getOrElse(100000L)
    val versions = args.lift(1).map(_.toInt).getOrElse(20)
    val factRows = args.lift(2).map(_.toLong).getOrElse(5000000L)
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

    val base = java.nio.file.Files.createTempDirectory("graft-stats-probe")
    val sch = MatSchema(Seq(Dimension("k", 1000000)),
      Seq(ValueCol("dv", org.apache.spark.sql.types.LongType)))
    // hot dim: `versions` upsert rounds over the same keys
    val hot = MatDb.create(spark, sch, base.resolve("hot").toString)
    (0 until versions).foreach { i =>
      val t = hot.newTransaction()
      t.addRows(spark.range(dimKeys).select(col("id").as("k"),
        (col("id") * 31 + i).as("dv")))
      t.commit()
    }
    // cold dim: one version (small either way)
    val cold = MatDb.create(spark, sch, base.resolve("cold").toString)
    val tc = cold.newTransaction()
    tc.addRows(spark.range(dimKeys).select(col("id").as("k"), (col("id") * 7).as("dv")))
    tc.commit()

    val fact = spark.range(factRows).select((col("id") % dimKeys).as("k"),
      (col("id") * 3).as("f"))

    def joined(): DataFrame = {
      val h = spark.read.format("graft").load(base.resolve("hot").toString)
        .select(col("k"), col("dv").as("hv"))
      val c = spark.read.format("graft").load(base.resolve("cold").toString)
        .select(col("k"), col("dv").as("cv"))
      fact.join(h, "k").join(c, "k")
        .groupBy().agg(sum(col("f") + col("hv") + col("cv")).as("s"))
    }

    def run(label: String): (Double, Long, String) = {
      joined().collect() // warm
      var best = Double.MaxValue
      var bytes = 0L
      (1 to 3).foreach { _ =>
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        joined().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        bytes = shuffleBytes.get() - b0
      }
      val plan = joined().queryExecution.sparkPlan.toString
      val joins = "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
        .findAllIn(plan).toSeq.mkString("+")
      println(f"[probe] $label%-10s joins=$joins%-40s min=${best}%6.3f s shuffleBytes=$bytes")
      (best, bytes, joins)
    }

    val rawBytes = hot.visibleBytes()
    // threshold between the hot dim's resolved estimate and its raw bytes:
    // the exact situation a default threshold hits at larger scale
    val resolvedEst = dimKeys * sch.toStructType.defaultSize
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      ((resolvedEst + rawBytes) / 2).toString)

    val noStats = run("no_stats")
    val (rows, analyzed) = hot.analyze()
    cold.analyze()
    val withStats = run("analyzed")

    require(rows == dimKeys)
    require(noStats._3.contains("SortMergeJoin"),
      s"raw pricing must degrade the hot-dim join to sort-merge: ${noStats._3}")
    require(withStats._3 == "BroadcastHashJoin+BroadcastHashJoin",
      s"analyzed pricing must broadcast BOTH dims: ${withStats._3}")
    require(withStats._2 * 2 < noStats._2,
      s"broadcast plan must avoid the fact-side join shuffle: ${withStats._2} vs ${noStats._2}")

    val json =
      s"""{"metric":"stats_probe","dim_keys":$dimKeys,"versions":$versions,
         |"fact_rows":$factRows,"hot_raw_bytes":$rawBytes,"hot_analyzed_bytes":$analyzed,
         |"no_stats":{"joins":"${noStats._3}","sec":${noStats._1},"shuffle_bytes":${noStats._2}},
         |"analyzed":{"joins":"${withStats._3}","sec":${withStats._1},"shuffle_bytes":${withStats._2}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "stats_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    spark.stop()
  }
}
