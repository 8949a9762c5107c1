package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-attribution of the maintenance-fold write cost (the `flush:write`
  * phase MaintProfile surfaces): how much of a small partitioned parquet
  * write is the repartition exchange, the dynamic-partition writer, the
  * commit protocol, and how it scales with row count. Diagnostic only. */
object FlushProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-flushprobe")
    var n = 0
    def t(label: String)(f: => Unit): Unit = {
      val s = System.nanoTime(); f
      println(f"[flushprobe] $label%-44s ${(System.nanoTime() - s) / 1e9}%.3f s")
    }
    def dest(): String = { n += 1; root.resolve(s"d$n").toString }

    def mk(rows: Int): DataFrame =
      spark.range(rows).select(
        (col("id") % 40).as("grp"),
        ((col("id") % 40) / 10).cast("long").as("_ck_grp"),
        col("id").as("v"),
        lit(false).as("_del"), lit(7L).as("_txn"), lit(0L).as("_seq"))
        .persist()

    for (rows <- Seq(500, 500, 5000, 60000)) {
      val df = mk(rows); df.count()
      t(s"$rows rows: repartition+sort+partitionBy+zstd") {
        df.repartition(col("_ck_grp"))
          .sortWithinPartitions(col("_ck_grp"), col("grp"))
          .write.mode(SaveMode.Append).option("compression", "zstd")
          .partitionBy("_ck_grp").parquet(dest())
      }
      t(s"$rows rows: no-repart, sort, partitionBy") {
        df.sortWithinPartitions(col("_ck_grp"), col("grp"))
          .write.mode(SaveMode.Append).option("compression", "zstd")
          .partitionBy("_ck_grp").parquet(dest())
      }
      t(s"$rows rows: coalesce(1)+sort+partitionBy") {
        df.coalesce(1)
          .sortWithinPartitions(col("_ck_grp"), col("grp"))
          .write.mode(SaveMode.Append).option("compression", "zstd")
          .partitionBy("_ck_grp").parquet(dest())
      }
      t(s"$rows rows: repart, no partitionBy") {
        df.repartition(col("_ck_grp"))
          .sortWithinPartitions(col("_ck_grp"), col("grp"))
          .write.mode(SaveMode.Append).option("compression", "zstd")
          .parquet(dest())
      }
      t(s"$rows rows: plain noop") {
        df.write.format("noop").mode(SaveMode.Overwrite).save()
      }
      df.unpersist()
    }
    graft.core.Storage.deleteRecursively(root)
    spark.stop()
  }
}
