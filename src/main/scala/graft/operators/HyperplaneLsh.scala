package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-probe random-hyperplane LSH for cosine ANN (SURVEY.md §9.2 #6;
  * the battery's q51 is the single-probe oracle-replayable form).
  *
  * Signature: bit j of a vector's bucket is the sign of its dot product
  * with pseudo-random plane j. Multi-probe search (Lv et al., VLDB'07
  * shape): a query additionally probes the buckets obtained by flipping
  * its LEAST-CONFIDENT bits — the planes with the smallest |dot|, i.e.
  * the hyperplanes the query sits closest to, where its true neighbors
  * most plausibly landed on the other side. Probing q's `1 + nflip`
  * buckets multiplies candidate coverage without any second index.
  *
  * Scale: bucketing is a per-row map (codegen vec_dot against literal
  * plane arrays); search shuffles only on `bucket`; the query side is
  * broadcast. Written bucket-partitioned (as in [[IvfIndex.writeIndex]])
  * the probes prune partitions identically.
  */
object HyperplaneLsh {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotCol(a, b)

  /** Deterministic pseudo-random planes (LCG over [-0.5, 0.5)); a seeded
    * family so indexes are reproducible without storing the planes. */
  def planes(nBits: Int, dim: Int, seed: Long = 41L): Seq[Seq[Double]] =
    (0 until nBits).map { j =>
      (0 until dim).map { i =>
        val x = (seed + 1009L * j + 31L * i) * 6364136223846793005L + 1442695040888963407L
        // top 53 bits as a double in [0, 1), shifted to [-0.5, 0.5)
        (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }

  /** Per-plane dot products of `emb` (array<double>). */
  private def dots(emb: Column, ps: Seq[Seq[Double]]): Column =
    array(ps.map(p => dot(emb, typedlit(p))): _*)

  /** The signature bucket: bit j set iff dots(j) >= 0 (zero planes = the
    * degenerate single bucket, i.e. a full scan — the brute-force oracle). */
  def bucket(emb: Column, ps: Seq[Seq[Double]]): Column =
    if (ps.isEmpty) lit(0L)
    else {
      val d = dots(emb, ps)
      ps.indices.map(j =>
        when(element_at(d, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    }

  /** Top-k cosine neighbors: corpus bucketed once, each query probes its
    * own bucket plus the buckets reached by flipping each of its `nflip`
    * least-confident bits (ascending |margin|). Returns
    * (qid, idCol, score, rn). */
  def searchTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      ps: Seq[Seq[Double]], nflip: Int, k: Int): DataFrame = {
    require(nflip >= 0 && nflip <= ps.size, s"nflip must be in [0, ${ps.size}]")
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.register(corpus.sparkSession)
    val cand = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", bucket(col("v"), ps))
    val q0base = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("_own", bucket(col("qv"), ps))
    val q0 =
      if (nflip == 0) q0base
      else q0base
        .withColumn("_d", dots(col("qv"), ps))
        .withColumn("_probe_order", expr(
          s"array_sort(zip_with(transform(_d, x -> abs(x)), sequence(0, ${ps.size - 1}), (m, i) -> struct(m as m, i as i)))"))
    val probes = (0 until nflip).foldLeft(array(col("_own"))) { (acc, r) =>
      concat(acc, array(col("_own").bitwiseXOR(
        expr(s"shiftleft(cast(1 as bigint), element_at(_probe_order, ${r + 1}).i)"))))
    }
    val q = q0.withColumn("bucket", explode(array_distinct(probes)))
      .select(col("qid"), col("qv"), col("bucket"))
    // no dedup needed: each corpus vector lives in exactly ONE bucket and
    // the probe list is array_distinct'ed, so the bucket equi-join emits
    // at most one row per (query, candidate)
    broadcast(q).join(cand, Seq("bucket"))
      .where(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        (dot(col("qv"), col("v")) /
          sqrt(dot(col("qv"), col("qv")) * dot(col("v"), col("v")))).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col(idCol))).cast("long"))
      .where(col("rn") <= k)
  }
}
