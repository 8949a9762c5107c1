package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join — match each point to every interval
  * containing it WITHOUT an equi-key, turned into an equi-join Spark can
  * shuffle-partition (the bin/bucket range-join technique; Spark itself
  * would plan a point-in-interval theta join as BroadcastNestedLoopJoin —
  * O(points × intervals) compares and a broadcast of one whole side,
  * a non-starter at scale).
  *
  * Technique: pick a bucket width `bucket` (≈ the typical interval
  * length). Each point lands in exactly ONE bucket
  * (`floorDiv(pt, bucket)` — the exact integral floor division shared
  * with the chunk-routing write path). Each interval REPLICATES to every
  * bucket it overlaps (`sequence(floorDiv(lo), floorDiv(hi))` — i.e.
  * `len/bucket + 1` copies, so replication is bounded by the caller's
  * bucket choice). The join is then a plain shuffled equi-join on the
  * bucket id with the `lo <= pt <= hi` containment as a residual — and
  * because a point has exactly one bucket, each matching (point,
  * interval) pair is produced exactly once: no post-dedup.
  *
  * Cost model: shuffle O(points + intervals · span/bucket), compare
  * O(pairs sharing a bucket) — not O(points × intervals). A hot bucket
  * (skewed time range) is an AQE skew-join split candidate like any other
  * shuffled equi-join; intervals of wildly varying length argue for the
  * multi-resolution variant (bucket per length class), which callers can
  * build by unioning two calls.
  *
  * Mirrors the interval-join shape of streaming engines (Flink's interval
  * join) and warehouse range-join optimizations; the DuckDB oracle checks
  * it with its native inequality join (q145).
  */
object RangeJoin {

  /** Join `points` to `intervals` on containment:
    * `intervals(lo) <= points(pt) <= intervals(hi)`.
    *
    * @param points    point side; `pt` a LONG column (e.g. epoch nanos)
    * @param pt        point column name
    * @param intervals interval side; `lo`/`hi` LONG columns, `lo <= hi`
    *                  (rows violating it simply match nothing)
    * @param lo        interval start column name (inclusive)
    * @param hi        interval end column name (inclusive)
    * @param bucket    bucket width in `pt` units (> 0); choose ≈ typical
    *                  interval length
    * @return one row per contained (point, interval) pair carrying both
    *         sides' columns (names must be disjoint)
    */
  def pointInInterval(
      points: DataFrame,
      pt: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both have: $overlap")

    def cell(c: Column): Column = graft.core.MatSchema.chunkKeyCol(c, bucket)

    val p = points.withColumn("_rj_b", cell(col(pt)))
    // interval → bucket replication in BOUNDED slices (Densify.explodeRange):
    // replication is still len/bucket + 1 rows, but an interval spanning
    // millions of buckets no longer materializes them as one array value
    val iv = Densify.explodeRange(intervals, cell(col(lo)), cell(col(hi)), "_rj_b")
    p.join(iv, p("_rj_b") === iv("_rj_b") &&
        col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop(p("_rj_b")).drop(iv("_rj_b"))
  }

  /** INTERVAL-OVERLAP join — match every pair of intervals that intersect
    * (`leftLo <= rightHi && rightLo <= leftHi`, both ends inclusive),
    * without an equi-key: the sensor domain's "maintenance windows ×
    * outage windows" ask, which Spark alone would plan as a nested-loop
    * over the full cross product.
    *
    * Technique: both sides replicate to every bucket they span (bounded
    * slices, like [[pointInInterval]]); an overlapping pair shares at
    * least one bucket, and would match in EVERY bucket their intersection
    * spans — so each pair is OWNED by exactly one bucket, the one
    * containing the intersection's start `max(leftLo, rightLo)` (which
    * lies inside both intervals whenever they overlap), and only the
    * owner emits it: exactly-once with no post-dedup shuffle.
    *
    * Cost: shuffle O(Σ len/bucket) replicas per side, compare O(pairs
    * sharing a bucket). Mixed lengths: see [[intervalOverlapMultiRes]].
    *
    * @param left  interval side; `lLo`/`lHi` LONG columns
    * @param right interval side; `rLo`/`rHi` LONG columns (names disjoint
    *              from `left`'s)
    * @param bucket bucket width (> 0), ≈ typical interval length
    * @return one row per overlapping (left, right) pair with both sides'
    *         columns
    */
  def intervalOverlap(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"column names must be disjoint, both have: $overlapCols")
    def cell(c: Column): Column = graft.core.MatSchema.chunkKeyCol(c, bucket)
    // rows with lo > hi match nothing (same contract as pointInInterval) —
    // filtered BEFORE replication: an inverted interval's descending slice
    // replication could revisit a bucket, breaking the owner-emits-once rule
    val l = Densify.explodeRange(left.where(col(lLo) <= col(lHi)),
      cell(col(lLo)), cell(col(lHi)), "_rj_lb")
    val r = Densify.explodeRange(right.where(col(rLo) <= col(rHi)),
      cell(col(rLo)), cell(col(rHi)), "_rj_rb")
    l.join(r, l("_rj_lb") === r("_rj_rb") &&
        col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        cell(greatest(col(lLo), col(rLo))) === l("_rj_lb"))
      .drop(l("_rj_lb")).drop(r("_rj_rb"))
  }

  /** [[intervalOverlap]] for mixed interval lengths: the LEFT side
    * partitions into doubling length classes (each left interval then
    * replicates to ≤ 2 cells of its class's bucket width); the right side
    * replicates per class at that class's width. Classes PARTITION the
    * left side and each class applies the owner-bucket rule, so every
    * overlapping pair still appears exactly once. Cost: `classes` joins,
    * right-side replication Σ_i len_r/bucket_i — put the LONGER-interval
    * side on the left if both are mixed.
    *
    * @param base bucket width for the shortest class (> 0)
    * @param knownMaxLen caller-known bound on LEFT interval length — skips
    *                    the sizing aggregate; a violated bound stays exact
    *                    (the top class is open-ended) */
  def intervalOverlapMultiRes(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      base: Long,
      maxClasses: Int = 40,
      knownMaxLen: Option[Long] = None): DataFrame = {
    require(base > 0, s"base must be positive, got $base")
    require(maxClasses >= 1 && maxClasses <= 62, s"bad maxClasses $maxClasses")
    val len = col(lHi) - col(lLo)
    val maxLen = knownMaxLen.getOrElse {
      val maxLenRow = left.agg(max(len)).head()
      if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getLong(0)
    }
    val needed = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxLen / base)))
    val classes = math.min(maxClasses, needed)
    def classOf(i: Int): Column = {
      val lower = base * (1L << i)
      if (classes == 1) lit(true)
      else if (i == 0) len < lower * 2
      else if (i == classes - 1) len >= lower
      else len >= lower && len < lower * 2
    }
    (0 until classes).map { i =>
      intervalOverlap(left.where(classOf(i)), lLo, lHi, right, rLo, rHi,
        bucket = base * (2L << i))
    }.reduce(_ unionByName _)
  }

  /** [[pointInInterval]] for interval lengths spanning orders of magnitude.
    *
    * One bucket width cannot serve mixed lengths: sized for the short
    * intervals it replicates a long interval `len/bucket + 1` times;
    * sized for the long ones it packs every short interval (and most
    * points) into a few giant cells. The classic fix is per-length-class
    * resolution: intervals partition into doubling length classes
    * `[base·2^i, base·2^(i+1))`, each class joins at its own bucket width
    * `base·2^(i+1)` (so every interval in the class replicates to at most
    * 2 cells), and the class results union. Points are small to
    * re-bucket (one integral floor-div per class); classes partition the
    * INTERVALS, so each matching pair still appears exactly once. Cost:
    * `classes` shuffled equi-joins of (all points + that class's
    * intervals) — `classes` is log2(maxLen/base), e.g. 7 joins for
    * lengths from 1 s to 2 min at base 1 s.
    *
    * @param base bucket width for the shortest class (> 0); intervals
    *             shorter than `base` join in the first class
    * @param knownMaxLen a caller-known upper bound on interval length
    *             (e.g. "maintenance windows never exceed 4 h"): skips the
    *             sizing aggregate — one fewer blocking Spark job before
    *             planning. Intervals longer than the bound still join
    *             EXACTLY (the top class is open-ended) — a loose bound
    *             only costs replication, never correctness.
    */
  def pointInIntervalMultiRes(
      points: DataFrame,
      pt: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      base: Long,
      maxClasses: Int = 40,
      knownMaxLen: Option[Long] = None): DataFrame = {
    require(base > 0, s"base must be positive, got $base")
    require(maxClasses >= 1 && maxClasses <= 62, s"bad maxClasses $maxClasses")
    // one scalar aggregate sizes the class count to the data (driver-side,
    // O(1) result — not a data collect); an empty interval side still
    // produces a correctly-shaped empty result through class 0
    val len = col(hi) - col(lo)
    val maxLen = knownMaxLen.getOrElse {
      val maxLenRow = intervals.agg(max(len)).head()
      if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getLong(0)
    }
    val needed = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxLen / base)))
    val classes = math.min(maxClasses, needed)
    // class i holds lengths in [base·2^i, base·2^(i+1)) — derivable per
    // row, so the split is one filter per class, no shuffle of its own
    def classOf(i: Int): Column = {
      val lower = base * (1L << i)
      if (classes == 1) lit(true)
      else if (i == 0) len < lower * 2
      else if (i == classes - 1) len >= lower
      else len >= lower && len < lower * 2
    }
    (0 until classes).map { i =>
      val classIvs = intervals.where(classOf(i))
      pointInInterval(points, pt, classIvs, lo, hi, bucket = base * (2L << i))
    }.reduce(_ unionByName _)
  }
}
