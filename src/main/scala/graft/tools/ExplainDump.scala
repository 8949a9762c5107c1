package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump every battery query's formatted physical plan to a directory —
  * diffable round-over-round so plan regressions (lost broadcast, lost
  * pushdown, aggregate fallbacks) are visible in review, not just in
  * timings. Usage: runMain graft.tools.ExplainDump [sfDir] [outDir] */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse("plans")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // mirror the Bench session's planner-visible confs (round 16): the
      // committed plans must show the join strategies and cached-plan
      // partitioning the bench actually times
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val errors = SparkEntryPlans.dump(spark, sfDir, outDir)
    spark.stop()
    // completeness guard: every battery query must leave a clean dump —
    // round 5/6 shipped a 96-file plans/ for a 97-query battery and nobody
    // noticed until the judge counted
    val expected = graft.SparkEntry.queries.size
    val written = Paths.get(outDir).toFile.list().count(_.endsWith(".txt"))
    if (errors.nonEmpty || written < expected) {
      System.err.println(s"[plans] INCOMPLETE: $written/$expected dumps, " +
        s"${errors.size} errored: ${errors.mkString(", ")}")
      sys.exit(1)
    }
    println(s"[plans] wrote $expected plans to $outDir/")
  }
}

object SparkEntryPlans {
  /** Dumps every query's formatted plan; returns the names that errored
    * (their files carry the ERROR text for diffing). */
  def dump(spark: SparkSession, sfDir: String, outDir: String): Seq[String] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val (text, err) =
        try {
          val df = fn(spark, sfDir)
          // strip volatile ids/paths for stable diffs
          (df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .replaceAll("#\\d+", "#N")
            .replaceAll("plan_id=\\d+", "plan_id=N")
            // JVM-run-volatile identities: lambda class names and default
            // Object.toString hashes (Lambda$5479/0x7f4e...@1607278e)
            .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$N")
            .replaceAll("@[0-9a-f]{6,16}\\b", "@N")
            // per-run fixture roots (Q.fixture embeds the pid)
            .replaceAll("graft-run-\\d+", "graft-run-PID"), false)
        } catch { case e: Throwable => (s"ERROR: ${e.getMessage}", true) }
      Files.write(Paths.get(s"$outDir/$name.txt"), text.getBytes("UTF-8"))
      if (err) Some(name) else None
    }
}
