package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", 2023): fit bucketed bag-of-hashed-features models
  * (unigrams, optionally + bigrams — `ngrams = 2`, the paper's feature
  * set) of a TARGET corpus (the distribution you want more of) and the
  * RAW pool,
  * score every raw document by its log likelihood ratio
  * sum_b c_b * (log p_target(b) - log p_raw(b)), and keep the top-k.
  *
  * Two deliberate divergences from the paper, both for engine fit:
  *  - The log is an EXACT integer fixed-point log2 (shift-and-square,
  *    [[Dsir.FracBits]] fractional bits) over the +1-smoothed integer
  *    bucket counts — every score is an int64 computed with integer
  *    ops only, so a relational oracle replays it bit-exactly
  *    (the same no-libm discipline as Bm25's log-free RSJ weight).
  *  - Selection is deterministic top-k by score (doc id tiebreak) rather
  *    than Gumbel sampling — reproducible across runs and engines.
  *
  * Scale shape: one token explosion + two hash aggregates per corpus fit
  * (the score table is `buckets` rows — constant); scoring is one token
  * explosion + a broadcast join of that table + one hash aggregate per
  * doc. Nothing is quadratic in the corpus; the top-k is
  * TakeOrderedAndProject (O(k) per partition). */
object Dsir {

  /** Fractional bits of the fixed-point log2. */
  val FracBits = 16

  /** 56-bit md5 hash — the cross-engine hash idiom (fits int64 exactly). */
  private def h56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** Lower-cased alphabetic word features, exploded one row per feature:
    * unigrams, plus space-joined bigrams when `ngrams = 2` (the paper's
    * feature set). Bigrams come from one `zip_with` of the word array
    * against its own tail — no second explosion pass; the null the
    * padding produces at the end is filtered out. */
  private def tokens(textCol: Column, ngrams: Int): Column = {
    require(ngrams == 1 || ngrams == 2, s"ngrams must be 1 or 2, got $ngrams")
    val words = regexp_extract_all(lower(textCol), lit("[a-z]+"), lit(0))
    if (ngrams == 1) explode(words)
    else explode(concat(words, filter(
      zip_with(words, slice(words, lit(2), size(words)), (x, y) => concat(x, lit(" "), y)),
      _.isNotNull)))
  }

  /** Adds `outCol` = L(`nCol`) where L(n) is the exact integer fixed-point
    * log2 of a POSITIVE int64: normalize n's mantissa to [2^30, 2^31),
    * then [[FracBits]] shift-and-square steps, each squaring the mantissa
    * and emitting one fractional bit. Every step is int64 multiply/shift/
    * compare — deterministic and replayable in any engine with 64-bit
    * integers ([[log2fpSqlCtes]] emits the identical chain as SQL).
    *
    * The loop is ONE `aggregate` higher-order expression, not a chain of
    * per-step columns: a 16-step withColumn chain referencing the previous
    * mantissa several times per step expands exponentially (2^16 subtrees)
    * when CollapseProject merges it — a single constant-size lambda
    * executes the same iteration per row instead. */
  def withLog2fp(df: DataFrame, nCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, expr(
      s"""aggregate(
         |  sequence(1, $FracBits),
         |  named_struct(
         |    'm', CASE WHEN length(bin($nCol)) - 1 <= 30
         |              THEN shiftleft($nCol, CAST(30 - (length(bin($nCol)) - 1) AS INT))
         |              ELSE shiftright($nCol, CAST((length(bin($nCol)) - 1) - 30 AS INT)) END,
         |    'acc', CAST(length(bin($nCol)) - 1 AS BIGINT)),
         |  (st, j) -> named_struct(
         |    'm', CASE WHEN shiftright(st.m * st.m, 30) >= 2147483648
         |              THEN shiftright(shiftright(st.m * st.m, 30), 1)
         |              ELSE shiftright(st.m * st.m, 30) END,
         |    'acc', st.acc * 2 +
         |           CASE WHEN shiftright(st.m * st.m, 30) >= 2147483648
         |                THEN 1 ELSE 0 END),
         |  st -> st.acc)""".stripMargin))

  /** The same chain as [[withLog2fp]], rendered as SQL CTE definitions for
    * oracle construction: given a CTE `vals(extraCols..., n)`, defines
    * `it` (the iterative shift-and-square — a RECURSIVE CTE, because a
    * chain of lateral column aliases would expand exponentially in the
    * binder) and `lg(extraCols..., l)`. Splice into a `WITH RECURSIVE`
    * list. */
  def log2fpSqlCtes(extraCols: String*): String =
    log2fpSqlCtesNamed("vals", "it", "lg", extraCols: _*)

  /** [[log2fpSqlCtes]] with caller-chosen CTE names, so several log chains
    * can coexist in one oracle (the Gumbel variant needs two more chains
    * AFTER the score chain — each reads the previous chain's output). */
  def log2fpSqlCtesNamed(valsName: String, itName: String, lgName: String,
      extraCols: String*): String = {
    val keep = extraCols.map(c => s"$c, ").mkString
    s"""$itName AS (
       |  SELECT ${keep}0 AS j,
       |         CASE WHEN length(bin(n)) - 1 <= 30
       |              THEN n << (30 - (length(bin(n)) - 1))
       |              ELSE n >> ((length(bin(n)) - 1) - 30) END AS m,
       |         CAST(length(bin(n)) - 1 AS BIGINT) AS acc
       |  FROM $valsName
       |  UNION ALL
       |  SELECT $keep j + 1,
       |         CASE WHEN t >= 2147483648 THEN t >> 1 ELSE t END,
       |         acc * 2 + CASE WHEN t >= 2147483648 THEN 1 ELSE 0 END
       |  FROM (SELECT $keep j, (m * m) >> 30 AS t, acc FROM $itName WHERE j < $FracBits)
       |),
       |$lgName AS (SELECT $keep acc AS l FROM $itName WHERE j = $FracBits)""".stripMargin
  }

  /** Fit the per-bucket importance scores from a target corpus and the raw
    * pool: `score(b) = L(cnt_t(b)+1) - L(tot_t+B) - L(cnt_r(b)+1) + L(tot_r+B)`
    * — the fixed-point log2 likelihood ratio with add-one smoothing.
    * Returns `(bucket, score)`, exactly `buckets` rows. */
  def bucketScores(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int, ngrams: Int = 1): DataFrame = {
    val spark = target.sparkSession
    def counts(df: DataFrame) = df
      .select(tokens(col(textCol), ngrams).as("w"))
      .select((h56(col("w")) % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
    val all = spark.range(buckets).select(col("id").as("bucket"))
    val st = all
      .join(counts(target).withColumnRenamed("c", "ct"), Seq("bucket"), "left")
      .join(counts(raw).withColumnRenamed("c", "cr"), Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("ct"), lit(0L)) + 1L).as("np"),
        (coalesce(col("cr"), lit(0L)) + 1L).as("nq"))
    // long form: one L chain evaluates all four operand kinds (per-bucket
    // numerators; the two corpus-total denominators as bucket -1 rows)
    val tot = st.agg(sum(col("np")).as("n")).select(lit(-1L).as("bucket"),
      lit(2).as("kind"), col("n"))
    val totQ = st.agg(sum(col("nq")).as("n")).select(lit(-1L).as("bucket"),
      lit(3).as("kind"), col("n"))
    val vals = st.select(col("bucket"), lit(0).as("kind"), col("np").as("n"))
      .unionByName(st.select(col("bucket"), lit(1).as("kind"), col("nq").as("n")))
      .unionByName(tot).unionByName(totQ)
    val lg = withLog2fp(vals, "n", "l").select(col("bucket"), col("kind"), col("l"))
    val lp = lg.where(col("kind") === 0).select(col("bucket"), col("l").as("lp"))
    val lq = lg.where(col("kind") === 1).select(col("bucket"), col("l").as("lq"))
    val ldp = lg.where(col("kind") === 2).select(col("l").as("ldp"))
    val ldq = lg.where(col("kind") === 3).select(col("l").as("ldq"))
    lp.join(lq, "bucket")
      .crossJoin(broadcast(ldp)).crossJoin(broadcast(ldq))
      .select(col("bucket"),
        (col("lp") - col("ldp") - col("lq") + col("ldq")).as("score"))
  }

  /** Score documents against a fitted bucket-score table: one token
    * explosion, broadcast join of the constant score table, ONE per-doc
    * sum. `sum_b c_b * s_b` is summed per TOKEN directly (integer algebra
    * — identical result), not via an intermediate per-(doc, bucket) count:
    * that shape would hash-exchange on (doc, bucket) and then AGAIN on
    * doc, two shuffles of the same token-scale data where one suffices
    * (and the per-doc partial aggregation is map-side either way).
    * Returns `(idCol, dsir_score)`. */
  def scoreDocs(docs: DataFrame, scores: DataFrame, idCol: String,
      textCol: String, buckets: Int, ngrams: Int = 1): DataFrame =
    docs.select(col(idCol), tokens(col(textCol), ngrams).as("w"))
      .select(col(idCol), (h56(col("w")) % buckets).as("bucket"))
      .join(broadcast(scores), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("score")).as("dsir_score"))

  /** Deterministic importance selection: top-k by score, id tiebreak. */
  def select(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_score").desc, col(idCol)).limit(k)

  /** Gumbel-top-k importance SAMPLING — the paper's actual selection rule
    * (Xie et al. §2: sample without replacement ∝ importance weight),
    * kept deterministic and oracle-replayable: drawing k items with
    * probability ∝ 2^score is EXACTLY top-k of `score + G` where
    * `G = -log2(-log2 U)` is base-2 Gumbel noise (the classic Gumbel-max
    * trick, in the same base as the fixed-point log2 scores — no scale
    * mismatch, no libm). U comes from a seeded 40-bit integer hash of the
    * doc id, and both logs reuse the exact shift-and-square chain, so the
    * perturbed score is an int64 computed with integer ops only and a
    * relational oracle replays the draw bit-exactly (q131). A different
    * `seed` is a fresh draw; the same seed is reproducible across runs,
    * engines, and cluster sizes. Cost: two more per-row constant-size
    * `aggregate` lambdas on top of [[select]] — still one TakeOrdered. */
  def selectGumbel(scored: DataFrame, idCol: String, k: Int, seed: Long): DataFrame = {
    val m = (1L << 40) - 1L // r in [1, 2^40-1] => 0 < U < 1 strictly
    val withR = scored.withColumn("_r",
      h56(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))) % m + 1L)
    // -log2(U) = 40 - log2(r) (U = r / 2^40), fixed point
    val withV = withLog2fp(withR, "_r", "_lr")
      .withColumn("_v", lit(40L << FracBits) - col("_lr"))
    // G = -log2(-log2 U); the inner value carries FracBits, so its log2
    // reads FracBits too high — subtract them back
    val withG = withLog2fp(withV, "_v", "_lv")
      .withColumn("_g", lit(16L << FracBits) - col("_lv"))
    withG
      .withColumn("dsir_gumbel", col("dsir_score") + col("_g"))
      .orderBy(col("dsir_gumbel").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("dsir_score"), col("dsir_gumbel"))
  }
}
