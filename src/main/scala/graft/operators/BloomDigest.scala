package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Bloom membership digest of a fingerprint corpus — the
  * scale piece of incremental-ingest dedup. The exact novelty filter
  * ([[graft.streaming.Streams.noveltyFilter]]) anti-joins every
  * micro-batch against ALL committed history: correct, but the history
  * scan is the 100 TB side and it reruns per batch. The digest replaces
  * that with a compact membership test: rows whose fingerprint is
  * DEFINITELY absent (the overwhelming majority of a novel batch) skip
  * the history scan entirely; only the ~fpp sliver of maybes pays the
  * exact anti-join. The composed filter stays EXACT — Bloom false
  * positives only route extra rows to the exact check, never drop or
  * admit anything wrongly.
  *
  * Representation: the Bloom bit array lives as a plain DataFrame of
  * sparse 64-bit words — (word INDEX, bits LONG) — not as a sketch
  * object. Build is one `explode(k hash positions)` + `bit_or` hash
  * aggregate over history fingerprints; probe is the same explode on the
  * batch's DISTINCT fingerprints, a hash join against the word table,
  * and a per-fingerprint bool-AND. Everything is codegen'd built-ins;
  * there is no driver-side bitset, so a 10^10-fingerprint history at 1%
  * fpp (~12 GB of bits) is just a ~190M-row word table, partitioned like
  * any other table, while small digests broadcast via AQE. The digest
  * persists as parquet and unions incrementally: `bit_or` re-aggregation
  * of old words + a new batch's words is the update.
  *
  * The geometry (m_bits, n_hashes) is carried on every digest row:
  * probing with different constants than the build would break the
  * no-false-negative guarantee, so probes read them from the digest
  * itself rather than trusting a caller parameter.
  */
object BloomDigest {

  /** Standard Bloom sizing: bits = -n·ln(p)/ln(2)², rounded up to whole
    * 64-bit words. */
  def numBits(expectedItems: Long, fpp: Double): Long = {
    val raw = math.ceil(-expectedItems.toDouble * math.log(fpp)
      / (math.log(2) * math.log(2))).toLong
    math.max(64L, (raw + 63) / 64 * 64)
  }

  /** Optimal hash count: k = m/n · ln 2. */
  def numHashes(expectedItems: Long, mBits: Long): Int =
    math.max(1, math.round(mBits.toDouble / math.max(1L, expectedItems)
      * math.log(2)).toInt)

  /** Per-fingerprint (pos → word, mask) probe rows for the k hashes. */
  private def positions(fps: DataFrame, fpCol: String, m: Long, k: Int): DataFrame =
    fps.select(col(fpCol).as("fp"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("fp"),
        pmod(xxhash64(col("fp"), col("j")), lit(m)).as("pos"))
      .select(col("fp"), shiftright(col("pos"), 6).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").as("mask"))

  /** Build the digest table (word, bits, m_bits, n_hashes) from the
    * history's fingerprint column. `expectedItems` sizes the bit space
    * (overshooting costs bits, undershooting costs fpp); duplicates need
    * no pre-distinct — `bit_or` is idempotent. */
  def build(history: DataFrame, fpCol: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val m = numBits(expectedItems, fpp)
    val k = numHashes(expectedItems, m)
    positions(history, fpCol, m, k)
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .withColumn("m_bits", lit(m))
      .withColumn("n_hashes", lit(k))
  }

  /** Per-distinct-fingerprint verdict (fp, __maybe): true iff all k bits
    * are set. A word with no digest row contributes a zero word. */
  private def verdicts(df: DataFrame, digest: DataFrame, fpCol: String): DataFrame = {
    val meta = digest.select(max(col("m_bits")), max(col("n_hashes"))).head()
    val fps = df.select(col(fpCol).as("fp")).distinct()
    if (meta.isNullAt(0)) // empty digest = empty history: everything novel
      return fps.withColumn("__maybe", lit(false))
    positions(fps, "fp", meta.getLong(0), meta.getInt(1))
      .join(digest.select(col("word"), col("bits")), Seq("word"), "left")
      .select(col("fp"),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0).as("hit"))
      .groupBy(col("fp")).agg(min(col("hit")).as("__maybe"))
  }

  private def flag(df: DataFrame, digest: DataFrame, fpCol: String): DataFrame =
    df.join(verdicts(df, digest, fpCol).withColumnRenamed("fp", fpCol),
        Seq(fpCol), "left")
      .withColumn("__maybe", coalesce(col("__maybe"), lit(false)))

  /** Rows whose fingerprint is definitely NOT in the digested history —
    * no false negatives: a digested fingerprint never lands here. */
  def definitelyNovel(df: DataFrame, digest: DataFrame, fpCol: String): DataFrame =
    flag(df, digest, fpCol).where(!col("__maybe")).drop("__maybe")

  /** Rows the digest cannot rule out (members plus ~fpp false positives);
    * the sliver that still needs an exact history check. */
  def maybeSeen(df: DataFrame, digest: DataFrame, fpCol: String): DataFrame =
    flag(df, digest, fpCol).where(col("__maybe")).drop("__maybe")

  /** EXACT novelty filter with the digest as prefilter: definite
    * novelties skip the history scan; only the maybes anti-join the full
    * history (their fingerprints broadcast, so the history side streams —
    * never shuffles). Spec-pinned equivalent to the plain anti-join. */
  def noveltyFilter(batch: DataFrame, history: DataFrame, digest: DataFrame,
      fpCol: String): DataFrame = {
    val flagged = flag(batch, digest, fpCol)
    val definite = flagged.where(!col("__maybe")).drop("__maybe")
    val maybes = flagged.where(col("__maybe")).drop("__maybe")
    val fps = maybes.select(col(fpCol)).distinct()
    val hits = history.select(col(fpCol))
      .join(broadcast(fps), Seq(fpCol), "left_semi").distinct()
    definite.unionByName(maybes.join(broadcast(hits), Seq(fpCol), "left_anti"))
  }
}
