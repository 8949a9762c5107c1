package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.core.{Dimension, MatDb, MatSchema, ValueCol}
import graft.operators.IncrementalAgg

/** Evidence for IncrementalAgg's scale claim: maintenance cost is
  * O(delta), independent of how large the BASE table has grown. The probe
  * commits constant-size upsert batches to a growing base and times the
  * delta-mode maintenance after each; the late/early ratio over a run in
  * which the base grows ~12× is the bounded-cost signal (the same
  * methodology as IngestThroughputProbe — absolute seconds are hostage to
  * CPU steal, the growth ratio within one run is not).
  *
  * Two phases: WITHOUT checkpointing, the per-step cost creeps — not
  * with data volume but with SEGMENT COUNT (changesBetween's restricted
  * resolve lists and footer-reads every txn's segment set ≤ `to`); WITH
  * `checkpointIfNeeded` after each commit, the listing is bounded and the
  * curve flattens — the composition the two operators were built for.
  *
  * Usage: runMain graft.tools.ViewMaintProbe [batches] [rowsPerBatch] →
  * one JSON line + a `view_maint_probe.json` artifact in bench/.
  */
object ViewMaintProbe {

  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(12)
    val rows = args.lift(1).map(_.toInt).getOrElse(5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dec = DecimalType(18, 4)
    def run(label: String, checkpointing: Boolean): (Seq[(Int, Double, Long)], Double) = {
      val base = MatDb.create(spark,
        MatSchema(Seq(Dimension("k", 100000)),
          Seq(ValueCol("g", LongType), ValueCol("v", dec))),
        java.nio.file.Files.createTempDirectory(s"graft-vmp-base-$label").toString,
        "manifest")
      val view = MatDb.create(spark,
        MatSchema(Seq(Dimension("g", 1000)),
          Seq(ValueCol("sum_v", dec), ValueCol("cnt", LongType))),
        java.nio.file.Files.createTempDirectory(s"graft-vmp-view-$label").toString,
        "manifest")
      var delta = (0L, 0L) // (from, to) txn bounds of the latest commit
      val points = (1 to nBatches).map { b =>
        // constant-size delta: fresh keys + some overwrites, 200 groups
        val txn = base.newTransaction()
        txn.addRows(spark.range((b - 1).toLong * rows / 2, (b - 1).toLong * rows / 2 + rows)
          .select(col("id").as("k"), pmod(col("id"), lit(200L)).as("g"),
            (col("id") % 1000).cast(dec).as("v")))
        txn.commit()
        delta = (txn.id.get - 1L, txn.id.get)
        val t0 = System.nanoTime()
        IncrementalAgg.maintain(base, view, delta._1, delta._2, "g", "v")
        val secs = (System.nanoTime() - t0) / 1e9
        if (checkpointing) {
          // fold base AND view history; the next maintenance's from-txn is
          // always inside the retained window
          base.checkpointIfNeeded(maxSegments = 6, retainTxns = 3)
          view.checkpointIfNeeded(maxSegments = 6, retainTxns = 3)
        }
        val hist = b.toLong * rows
        System.err.println(
          f"[view-maint] $label b$b: $rows delta rows, ~$hist base rows, $secs%.2f s, " +
            s"${base.committedSegments.size} base segsets")
        (b, secs, hist)
      }
      val warm = points.drop(2)
      val ratio =
        if (warm.size < 4) 1.0
        else warm.takeRight(2).map(_._2).sum / warm.take(2).map(_._2).sum
      (points, ratio)
    }
    val (plain, plainRatio) = run("plain", checkpointing = false)
    val (ckpt, ckptRatio) = run("ckpt", checkpointing = true)
    def pointsJson(ps: Seq[(Int, Double, Long)]): String =
      ps.map(p => f"""{"batch":${p._1},"secs":${p._2}%.3f,"base_rows":${p._3}}""")
        .mkString("[", ",", "]")
    val json = s"""{"batches":$nBatches,"rows_per_batch":$rows,""" +
      f""""plain":{"points":${pointsJson(plain)},"growth_ratio":$plainRatio%.2f},""" +
      f""""with_checkpoint":{"points":${pointsJson(ckpt)},"growth_ratio":$ckptRatio%.2f}}"""
    println(json)
    val out = sys.env.get("SPARK_GRAFT_BENCH_DIR").map(java.nio.file.Paths.get(_))
      .orElse(sys.env.get("SPARK_GRAFT_REPO_ROOT").map(java.nio.file.Paths.get(_, "bench")))
      .getOrElse(java.nio.file.Paths.get("bench")).toAbsolutePath
    try {
      java.nio.file.Files.createDirectories(out)
      java.nio.file.Files.writeString(out.resolve("view_maint_probe.json"), json + "\n")
      System.err.println(s"[view-maint] wrote ${out.resolve("view_maint_probe.json")}")
    } catch { case e: Throwable => System.err.println(s"[view-maint] could not persist: $e") }
    spark.stop()
  }
}
