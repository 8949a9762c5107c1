package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev loop for a battery subset: run named queries against an sf dir,
  * dump results + a filtered oracle_sql.json in Verify's exact layout, so
  * `python3 tools/selfcheck.py <out> <sfDir>` gates just those queries.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <outDir> <name> [name...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntryJson.dumpFiltered(spark, sfDir, outDir, names)
    spark.stop()
  }
}

/** Shared with Verify-style dumps: the same JSON escaping rules. */
object SparkEntryJson {
  def dumpFiltered(spark: SparkSession, sfDir: String, outDir: String,
                   names: Set[String]): Unit = {
    graft.SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[qprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
