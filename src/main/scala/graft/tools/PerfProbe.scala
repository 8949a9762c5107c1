package graft.tools

import org.apache.spark.sql.SparkSession

/** Times selected battery queries in isolation (after a warm-up) and prints
  * their plans. Usage: runMain graft.tools.PerfProbe <sfDir> <q1,q2,...> */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q45_dedup_exact", "q46_ngram_jaccard", "q47_minhash_lsh")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    // warm up the JVM on an unrelated query
    qs("q05_grouped_count")(spark, sfDir).count()
    names.foreach { n =>
      val fn = qs(n)
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // same per-query lifetime as Bench
      println(f"[perf] $n%-22s $dt%7.2f s  ($cnt rows)")
      if (sys.env.contains("PERF_EXPLAIN")) fn(spark, sfDir).explain()
    }
    spark.stop()
  }
}
