package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence for round-13 `operators.RangeJoin`: Spark plans a
  * point-in-interval theta join (`lo <= pt AND pt <= hi`, no equi-key) as
  * BroadcastNestedLoopJoin — O(points × intervals) comparisons. The
  * bucketized rewrite replicates each interval to the cells it overlaps
  * and equi-joins on the cell id, making compare cost O(pairs sharing a
  * cell). The probe runs BOTH formulations on the same data (uniform
  * points, bounded-length intervals), requires identical match counts,
  * and records walls (min of 3). The naive side's input sizes are kept
  * small enough to finish; the ratio is what scales.
  *
  * Usage: runMain graft.tools.RangeJoinProbe [points] [intervals]
  * → one JSON line + bench/range_join_probe.json. */
object RangeJoinProbe {

  def main(args: Array[String]): Unit = {
    val nPts = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val nIvs = args.lift(1).map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val domain = 10000000000L // sparse 1e10 domain: a few M matching pairs
    val maxLen = 4000L        // interval length << domain: selective joins
    val pts = spark.range(nPts).select(col("id").as("pid"),
      pmod(expr("xxhash64(id)"), lit(domain)).as("pt")).cache()
    val ivs = spark.range(nIvs).select(col("id").as("iid"),
      pmod(expr("xxhash64(id, 7)"), lit(domain)).as("lo"))
      .withColumn("hi", col("lo") + pmod(expr("xxhash64(iid, 13)"), lit(maxLen)))
      .cache()
    pts.count(); ivs.count()

    def time(body: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm
      (1 to 3).map(_ => once()).minBy(_._1)
    }

    val (wallBucket, nBucket) = time {
      graft.operators.RangeJoin
        .pointInInterval(pts, "pt", ivs, "lo", "hi", bucket = maxLen)
        .count()
    }
    val (wallNaive, nNaive) = time {
      pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi")).count()
    }
    require(nBucket == nNaive,
      s"formulations disagree: bucketized $nBucket vs naive $nNaive")
    println(f"[probe] $nPts points x $nIvs intervals, $nBucket pairs: " +
      f"naive BNLJ $wallNaive%.2f s -> bucketized $wallBucket%.2f s " +
      f"(${wallNaive / wallBucket}%.1fx)")
    require(wallBucket * 3 < wallNaive,
      s"bucketized must beat the nested loop 3x+ here: $wallNaive vs $wallBucket")

    val json =
      s"""{"metric":"range_join_probe","points":$nPts,"intervals":$nIvs,
         |"pairs":$nBucket,"naive_bnlj_sec":$wallNaive,
         |"bucketized_sec":$wallBucket}""".stripMargin.replace("\n", "")
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "."), "bench", "range_join_probe.json")
    java.nio.file.Files.write(out, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[probe] wrote $out")
    spark.stop()
  }
}
