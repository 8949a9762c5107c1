package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dimension, MatSchema, ValueCol}
import graft.sources.RangedGraft

/** Evidence for round 13's PRICED ranged-layout statistics: a LogicalRDD
  * (the ranged read path) defaults to `spark.sql.defaultSizeInBytes` —
  * effectively infinite — so a small ranged dimension table could NEVER
  * broadcast and a big⋈small join always shuffled BOTH sides. After
  * `RangedGraft.analyze`, the recorded raw row count reaches the
  * LogicalRDD's `originStats` and the static plan flips to a broadcast
  * join: the big side's shuffle disappears entirely.
  *
  * The probe joins a `rows`-row ranged fact with a 2k-row ranged dim,
  * unanalyzed vs analyzed, recording wall (min of 3), shuffle bytes, and
  * the static join strategy. AQE's runtime SMJ→BHJ rescue is disabled
  * (`spark.sql.adaptive.autoBroadcastJoinThreshold = -1`) because the
  * probe measures the STATIC pricing decision — the one that avoids even
  * the map-side shuffle work a runtime flip has already paid for.
  *
  * Usage: runMain graft.tools.RangedStatsProbe [rows] → one JSON line +
  * bench/ranged_stats_probe.json. */
object RangedStatsProbe {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val schema = MatSchema(Seq(Dimension("k", 100000)), Seq(ValueCol("v")))
    val big = java.nio.file.Files.createTempDirectory("graft-rsp-big").toString
    val small = java.nio.file.Files.createTempDirectory("graft-rsp-small").toString
    val bounds = (1 to 15).map(i => rows * i / 16)
    RangedGraft.create(spark, big, schema, bounds)
    RangedGraft.create(spark, small, schema, bounds)
    RangedGraft.append(spark, big, schema,
      spark.range(rows).select(col("id").as("k"), (col("id") * 3).as("v")))
    RangedGraft.append(spark, small, schema,
      spark.range(0, rows, rows / 2000).select(col("id").as("k"), (col("id") * 7).as("v")))

    def query(): DataFrame = {
      val b = RangedGraft.snapshot(spark, big, schema)
      val s = RangedGraft.snapshot(spark, small, schema)
        .select(col("k"), col("v").as("w"))
      b.join(s, Seq("k")).agg(sum(col("v") + col("w")).as("s"), count(lit(1)).as("n"))
    }

    def run(label: String): (Double, Long, String) = {
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
      val static = query().queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val strategy =
        if (static.contains("BroadcastHashJoin")) "broadcast"
        else if (static.contains("SortMergeJoin")) "sort_merge"
        else "other"
      println(f"[probe] $label%-10s join=$strategy%-10s min=${best}%6.3f s shuffleBytes=$bytes")
      (best, bytes, strategy)
    }

    val before = run("unanalyzed")
    RangedGraft.analyze(spark, small, schema)
    val after = run("analyzed")

    require(before._3 == "sort_merge" && after._3 == "broadcast",
      s"analyze must flip the static strategy: ${before._3} -> ${after._3}")
    require(after._2 * 10 < before._2,
      s"the broadcast plan must shed the fact-side shuffle: ${before._2} -> ${after._2} bytes")

    val json =
      s"""{"metric":"ranged_stats_probe","rows":$rows,
         |"unanalyzed":{"join":"${before._3}","sec":${before._1},"shuffle_bytes":${before._2}},
         |"analyzed":{"join":"${after._3}","sec":${after._1},"shuffle_bytes":${after._2}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "ranged_stats_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    graft.core.Storage.deleteRecursively(java.nio.file.Paths.get(big))
    graft.core.Storage.deleteRecursively(java.nio.file.Paths.get(small))
    spark.stop()
  }
}
