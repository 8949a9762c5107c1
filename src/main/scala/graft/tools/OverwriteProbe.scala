package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Evidence for the round-11 O(new-data) `INSERT OVERWRITE` / `TRUNCATE`
  * (VERDICT r10 #1): the round-10 implementation resolved the ENTIRE live
  * table and wrote one tombstone per live key — a full scan plus a write
  * proportional to the OLD table. The manifest replace publish reads
  * nothing of the old table and writes only the new data, so overwrite
  * cost must be INDEPENDENT of the prior table size.
  *
  * The probe builds the same catalog table at two sizes (`smallRows`,
  * `bigRows` — default 20×), runs the same fixed-size `INSERT OVERWRITE`
  * into each, and records:
  *
  *   - parquet bytes READ during the overwrite (SparkListener input
  *     metrics) — the structural signal: the replace path reads ~0 table
  *     bytes at either size, the tombstone path reads the whole table;
  *   - wall seconds (min-of-3; timing is hostage to CPU steal, the byte
  *     counts are the deterministic signal);
  *   - `TRUNCATE TABLE` wall + bytes at the big size (the degenerate
  *     empty overwrite — O(1));
  *   - a time-travel read below the overwrite, proving the replaced state
  *     stays addressable (manifest lineage).
  *
  * Usage: runMain graft.tools.OverwriteProbe [smallRows] [bigRows]
  * → one JSON line + bench/overwrite_probe.json.
  */
object OverwriteProbe {

  def main(args: Array[String]): Unit = {
    val smallRows = args.lift(0).map(_.toLong).getOrElse(100000L)
    val bigRows = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val newRows = 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val root = java.nio.file.Files.createTempDirectory("graft-ovw-probe")
    spark.conf.set("spark.sql.catalog.govw", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.govw.root", root.toString)

    def build(name: String, rows: Long): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS govw.$name")
      spark.sql(s"CREATE TABLE govw.$name (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES('graft.dims' = 'k:100000')")
      spark.sql(s"INSERT INTO govw.$name SELECT id, id * 3 FROM range(0, $rows)")
    }

    /** (min wall sec of 3 fresh table+overwrite cycles, bytes read during
      * the LAST overwrite statement alone, pre-overwrite table bytes). */
    def measure(name: String, rows: Long, sql: String): (Double, Long, Long) = {
      var best = Double.MaxValue
      var bytes = 0L
      var preBytes = 0L
      (1 to 3).foreach { _ =>
        build(name, rows)
        preBytes = graft.core.MatDb.open(spark, root.resolve(name).toString)
          .visibleBytes()
        Thread.sleep(500) // let the listener bus drain the build's events
        val b0 = bytesRead.get()
        val t0 = System.nanoTime()
        spark.sql(sql)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        Thread.sleep(500) // drain the overwrite's own task-end events
        bytes = bytesRead.get() - b0
      }
      (best, bytes, preBytes)
    }

    val ovwSql = (n: String) =>
      s"INSERT OVERWRITE govw.$n SELECT id, id * 7 FROM range(0, $newRows)"
    val (smallSec, smallBytes, _) = measure("t_small", smallRows, ovwSql("t_small"))
    val (bigSec, bigBytes, tableBytes) = measure("t_big", bigRows, ovwSql("t_big"))
    val (truncSec, truncBytes, _) = measure("t_trunc", bigRows, "TRUNCATE TABLE govw.t_trunc")

    // time travel below the last overwrite still reads (manifest lineage)
    val preOvw = spark.sql("SELECT count(*) FROM govw.t_big VERSION AS OF 1")
      .head().getLong(0)
    require(preOvw == bigRows, s"VERSION AS OF below the overwrite must read: $preOvw")
    require(spark.sql("SELECT count(*) FROM govw.t_big").head().getLong(0) == newRows)

    // THE structural gates: the overwrite read no meaningful fraction of
    // the table at either size, and truncate read nothing
    require(bigBytes < tableBytes / 10,
      s"overwrite must not scan the old table: read $bigBytes of $tableBytes table bytes")
    require(truncBytes < tableBytes / 100,
      s"truncate must read ~nothing: read $truncBytes of $tableBytes table bytes")

    val json =
      s"""{"metric":"overwrite_probe","new_rows":$newRows,
         |"small":{"table_rows":$smallRows,"sec":$smallSec,"bytes_read":$smallBytes},
         |"big":{"table_rows":$bigRows,"sec":$bigSec,"bytes_read":$bigBytes},
         |"truncate_big":{"sec":$truncSec,"bytes_read":$truncBytes},
         |"big_table_bytes":$tableBytes,
         |"wall_ratio_big_over_small":${bigSec / smallSec}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "overwrite_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    spark.stop()
  }
}
