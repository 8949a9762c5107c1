package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Evidence for the round-15 ANN maintenance claim: a fold WRITES O(delta)
  * bytes, not O(touched bucket). Round 14 rewrote every touched bucket
  * whole — per batch the write cost was the full byte size of each bucket
  * either side of the delta touched (at k=8 over a shuffled corpus that is
  * effectively the whole corpus; at 100 TB with k=4096 a one-id delta
  * rewrote ~25 GB). The LSM layout appends one delta generation instead
  * (new rows + tombstones), and compaction amortizes the whole-corpus
  * rewrite over `graft.index.delta.maxpending` folds.
  *
  * The probe builds a deterministic corpus (xxhash64-derived coordinates —
  * no RNG, replay-stable), runs constant-size maintenance folds, and
  * records per fold: bytes actually written vs the bytes round 14 WOULD
  * have written (the touched buckets' current sizes — measured, not
  * assumed), plus the one-off compaction cost. Search answers are
  * verified against ground truth after every fold, so the savings are not
  * bought with wrong results.
  *
  * Usage: runMain graft.tools.IndexDeltaProbe [n] [dim] [k] [batches]
  * [deltaRows] → one JSON line + bench/index_delta_probe.json.
  */
object IndexDeltaProbe {

  private def treeBytes(p: String): Long = {
    val d = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.isDirectory(d)) 0L
    else {
      val s = java.nio.file.Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
      } finally s.close()
    }
  }

  private def bucketBytes(layout: String, b: Int): Long =
    treeBytes(s"$layout/bucket=$b")

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val batches = args.lift(3).map(_.toInt).getOrElse(6)
    val deltaRows = args.lift(4).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic corpus: coordinate j of vector i = hash(i, j) mapped
    // to [-0.5, 0.5) — xxhash64, never literal multiplications (ANSI mode)
    val coord = s"transform(sequence(0, ${dim - 1}), " +
      "j -> cast(pmod(xxhash64(vec_id, j), 1000) as double) / 1000.0 - 0.5)"
    val corpus = spark.range(n.toLong)
      .select(col("id").as("vec_id"), expr(coord).as("embedding"))
      .persist()
    corpus.count()

    val path = java.nio.file.Files.createTempDirectory("graft-idxdelta").toString
    val centroids = IvfIndex
      .train(corpus.limit(2000), "vec_id", "embedding", k, iters = 4)
      .map(_.toSeq).toSeq
    IvfIndex.writeIndex(corpus, "vec_id", "embedding", centroids, path)
    val layout = s"$path/corpus"
    val corpusBytes = treeBytes(layout)

    val steps = (0 until batches).map { b =>
      // constant-size delta: `deltaRows` vectors move to their antipodal
      // bucket (guaranteed bucket change on a sphere)
      val lo = (b * deltaRows).toLong
      val ups = corpus.where(col("vec_id").between(lo, lo + deltaRows - 1))
        .select(col("vec_id"), expr("transform(embedding, x -> -x)").as("embedding"))
      // what round 14 would have rewritten: every touched bucket, whole
      val oldB = IvfIndex.readLayout(spark, layout, "vec_id")
        .join(ups.select("vec_id"), Seq("vec_id"), "left_semi")
        .select("bucket").distinct().collect().map(_.getInt(0)).toSet
      val newB = IvfIndex.assign(
          ups.select(col("vec_id"), IvfIndex.normalized(col("embedding")).as("v")),
          "v", centroids)
        .select("bucket").distinct().collect().map(_.getInt(0)).toSet
      val touchedBytes = (oldB ++ newB).toSeq.map(bucketBytes(layout, _)).sum
      val before = treeBytes(layout) + treeBytes(s"${layout}_deltas")
      val t0 = System.nanoTime()
      IvfIndex.maintainIndex(spark, path, "vec_id", ups,
        ups.limit(0).select(col("vec_id")))
      val sec = (System.nanoTime() - t0) / 1e9
      val written = treeBytes(layout) + treeBytes(s"${layout}_deltas") - before
      (b, written, touchedBytes, sec)
    }

    // correctness spot-check after all folds: index answers == ground truth
    val moved = (0L until (batches * deltaRows).toLong)
    val post = corpus.select(col("vec_id"),
      when(col("vec_id") < lit(moved.end),
        expr("transform(embedding, x -> -x)")).otherwise(col("embedding"))
        .as("embedding"))
    val q = post.where(col("vec_id") < 5)
    val got = IvfIndex.searchIndex(spark, path, q, "vec_id", "embedding", 4, 5)
      .select("qid", "vec_id", "rn")
    val want = IvfIndex.searchTopK(post, q, "vec_id", "embedding", centroids, 4, 5)
      .select("qid", "vec_id", "rn")
    require(got.except(want).count() == 0 && want.except(got).count() == 0,
      "LSM-maintained index diverged from ground truth")

    val tComp0 = System.nanoTime()
    IvfIndex.compactLayout(spark, layout, "vec_id")
    val compactSec = (System.nanoTime() - tComp0) / 1e9

    val meanWritten = steps.map(_._2).sum / steps.size
    val meanTouched = steps.map(_._3).sum / steps.size
    val stepJson = steps.map { case (b, w, t, s) =>
      f"""{"batch":$b,"bytes_written":$w,"r14_touched_bucket_bytes":$t,"sec":$s%.3f}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"index_delta_maintenance","n":$n,"dim":$dim,"k":$k,""" +
        s""""delta_rows":$deltaRows,"corpus_bytes":$corpusBytes,""" +
        s""""mean_bytes_written":$meanWritten,""" +
        s""""mean_r14_touched_bucket_bytes":$meanTouched,""" +
        f""""write_amplification_cut":${meanTouched.toDouble / math.max(1L, meanWritten)}%.1f,""" +
        f""""compact_sec":$compactSec%.2f,"steps":$stepJson}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench/index_delta_probe.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
