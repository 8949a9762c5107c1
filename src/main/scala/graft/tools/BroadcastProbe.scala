package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dimension, MatDb, MatSchema, ValueCol}

/** Evidence for the `GraftRelation.sizeInBytes` fix: before it, a
  * `format("graft")` relation reported `spark.sql.defaultSizeInBytes`
  * (effectively infinite), so a fact-to-small-graft-dim join could never
  * be planned as a broadcast — the fact side was hash-exchanged for a
  * sort-merge join. The probe builds a small graft dim table, joins a
  * much larger fact against it WITHOUT hints, and measures both the
  * chosen plan and the shuffle bytes written:
  *
  *  - `auto`: the post-fix planner — real statistics, BroadcastHashJoin,
  *    the fact side is never exchanged (0 join-side shuffle writes).
  *  - `forced_shuffle`: autoBroadcastJoinThreshold = -1 — the plan the
  *    infinite-stats world forced: both sides exchanged + sorted.
  *
  * At 100 TB the delta IS the fact-table shuffle. Timings here are
  * hostage to CPU steal (min-of-3); the structural facts (join operator
  * chosen, shuffle bytes) are deterministic and are the signal.
  * Usage: runMain graft.tools.BroadcastProbe [dimKeys] [factRows] →
  * one JSON line + bench/broadcast_probe.json.
  */
object BroadcastProbe {

  def main(args: Array[String]): Unit = {
    val dimKeys = args.lift(0).map(_.toLong).getOrElse(50000L)
    val factRows = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shuffle-write accounting across the whole app, sampled around runs
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val dir = java.nio.file.Files.createTempDirectory("graft-bcast-probe")
    val sch = MatSchema(Seq(Dimension("k", 10000)),
      Seq(ValueCol("dim_v", org.apache.spark.sql.types.LongType)))
    val db = MatDb.create(spark, sch, dir.toString)
    val t = db.newTransaction()
    t.addRows(spark.range(dimKeys).select(col("id").as("k"), (col("id") * 3).as("dim_v")))
    t.commit()

    val fact = spark.range(factRows)
      .select((col("id") % dimKeys).as("k"), (col("id") * 7).as("f_v"))

    def joined(): DataFrame = spark.read.format("graft").load(dir.toString)
      .join(fact, "k")
      .groupBy()
      .agg(sum(col("dim_v") + col("f_v")).as("s"))

    def run(label: String): (String, Double, Long, String) = {
      // warm once, then min-of-3; shuffle bytes from the LAST run (the
      // per-run byte count is deterministic for a fixed plan)
      joined().collect()
      var best = Double.MaxValue
      var bytes = 0L
      (1 to 3).foreach { _ =>
        val b0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        joined().collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        bytes = shuffleBytes.get() - b0
      }
      val df = joined(); df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val join =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else if (plan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
        else "other"
      println(f"[probe] $label%-15s join=$join%-18s min=${best}%6.3f s shuffleBytes=$bytes")
      (label, best, bytes, join)
    }

    val auto = run("auto")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val forced = run("forced_shuffle")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    val statsBytes = spark.read.format("graft").load(dir.toString)
      .queryExecution.optimizedPlan.stats.sizeInBytes

    require(auto._4 == "BroadcastHashJoin",
      s"post-fix auto plan must broadcast the graft dim, got ${auto._4}")
    require(forced._4 != "BroadcastHashJoin",
      "threshold -1 must force the shuffle join the infinite-stats world produced")
    require(auto._3 < forced._3 / 10,
      s"broadcast path must avoid the fact shuffle: ${auto._3} vs ${forced._3}")

    val json =
      s"""{"metric":"broadcast_probe","dim_keys":$dimKeys,"fact_rows":$factRows,
         |"reported_stats_bytes":$statsBytes,
         |"auto":{"join":"${auto._4}","sec":${auto._2},"shuffle_bytes":${auto._3}},
         |"forced_shuffle":{"join":"${forced._4}","sec":${forced._2},"shuffle_bytes":${forced._3}}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "broadcast_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    spark.stop()
  }
}
