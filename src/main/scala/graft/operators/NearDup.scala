package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram-Jaccard near-duplicate detection as a scale-safe two-phase plan
  * (SURVEY.md §2.3 "North-star: dedup"; no reference counterpart — matdb has
  * no text operators).
  *
  * Phase 1 — candidate generation: inverted-index equi-join on shingles
  * (explode → self-join on the shingle, never doc×doc). The join input drops
  * shingles whose document frequency exceeds `dfCap`: one corpus-wide hot
  * shingle ("of the and …") shared by k docs would otherwise emit k²/2
  * candidate pairs on a single join key — the quadratic-skew scale-killer.
  * With the cap, per-shingle fan-out is bounded by dfCap²/2.
  *
  * Phase 2 — exact verify: shared-shingle counts and Jaccard are recomputed
  * over the FULL shingle sets, restricted (broadcast semi-join) to the
  * candidate pairs — so the cap never distorts a reported similarity, it can
  * only drop pairs whose every shared shingle is hotter than dfCap. Such a
  * pair cannot be ruled out in theory, but at any realistic cap it would be
  * a cluster of >dfCap near-identical docs sharing no rarer shingle; exact
  * dedup (q45) catches the identical-copy case first. The correctness oracle
  * replays the same cap, making the gate exact by construction.
  */
object NearDup {

  /** Reserved column name for the carried per-document distinct-shingle
    * count ([[shinglesWithSize]]); the underscore prefix keeps it out of
    * collision range of ordinary data columns — the carried-size branches
    * of [[cappedJaccardPairs]]/[[verifiedJaccard]] key off its presence. */
  val SizeCol = "_shingle_n"

  /** (id, g): exploded DISTINCT word n-gram shingles of `textCol` — the
    * single-pass codegen kernel [[graft.functions.WordShingles]] (same
    * tokens/distinct/order as the composed split+transform+array_distinct
    * form it replaced; TextOpsSpec pins the equality on the real corpus). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.TextOps.register(df.sparkSession)
    df.select(col(idCol),
      explode(graft.functions.TextOps.shinglesCol(col(textCol), lit(n))).as("g"))
  }

  /** (id, n, g): like [[shingles]] but every exploded row also carries its
    * document's DISTINCT-shingle count `n` — free in the same kernel pass
    * (size of the shingle array before exploding). [[cappedJaccardPairs]]
    * uses the carried count to compute Jaccard denominators inline instead
    * of joining the (huge) pair table against a per-document sizes table:
    * a sizes side has one row per document, which stops being
    * broadcastable long before 100 TB and forces two sort-merge shuffles
    * of the pair table (measured as the superlinear break in
    * PipelineScaleProbe between 50k and 100k docs). */
  def shinglesWithSize(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.TextOps.register(df.sparkSession)
    df.select(col(idCol),
        graft.functions.TextOps.shinglesCol(col(textCol), lit(n)).as("_gs"))
      .select(col(idCol), size(col("_gs")).as(SizeCol), explode(col("_gs")).as("g"))
  }

  /** (g, _df): per-shingle document frequency — the one aggregate every
    * df-capped path starts from. (A windowed `count over partitionBy(g)`
    * computes the same df but sorts the entire exploded table — measured
    * 7x slower at sf0.1.) */
  def shingleDf(ex: DataFrame): DataFrame =
    ex.groupBy(col("g")).agg(count(lit(1)).as("_df"))

  /** Shingles with document frequency above the cap — SMALL by
    * construction: at most (total shingle rows)/dfCap distinct values, and
    * in any real corpus the stop-shingle vocabulary, which is why it can be
    * broadcast for the anti-join below. */
  def hotShingles(ex: DataFrame, dfCap: Long): DataFrame =
    shingleDf(ex).where(col("_df") > dfCap).select(col("g"))

  /** Data-derived df cap (SURVEY.md §9.3 #3): instead of a hand-tuned
    * constant, read the observed document-frequency distribution and cap at
    * `headroom ×` its `quantile` point (floored at `floorCap` so tiny or
    * uniform corpora never cap real signal). The idea: the df distribution
    * of shingles is Zipfian — the p99.9 of the body sits orders of magnitude
    * below the stop-shingle head, so quantile×headroom cleanly separates
    * "hot tail to drop" from "rare shingles that carry similarity".
    *
    * Cost: one extra pass over the shingle index (a groupBy the capped join
    * does anyway) + an `approx_percentile` sketch — O(vocab) with a tiny
    * merge state, no sort. The returned cap is a driver-side scalar, so the
    * subsequent [[cappedJaccardPairs]] plan is unchanged. (Approximate is
    * the right tool: the cap only needs to land between body and head; an
    * exact percentile of a 100 TB vocabulary would pay a global sort for
    * precision the decision doesn't use.) */
  def adaptiveDfCap(ex: DataFrame, quantile: Double = 0.999, headroom: Double = 4.0,
      floorCap: Long = 64L): Long =
    adaptiveDfCapFrom(shingleDf(ex), quantile, headroom, floorCap)

  /** [[adaptiveDfCap]] over a precomputed (persisted) [[shingleDf]] table —
    * lets callers pay the vocabulary aggregate once and reuse it for the
    * hot set ([[jaccardPairsAdaptive]] does). */
  def adaptiveDfCapFrom(dfCounts: DataFrame, quantile: Double = 0.999,
      headroom: Double = 4.0, floorCap: Long = 64L): Long = {
    require(quantile > 0 && quantile < 1, s"quantile must be in (0,1): $quantile")
    val row = dfCounts
      .agg(expr(s"approx_percentile(_df, $quantile, 10000)").as("q"))
      .head
    // empty index (empty corpus / all docs below the shingle width) yields
    // a NULL percentile — fall back to the floor rather than NPE
    if (row.isNullAt(0)) floorCap
    else math.max(floorCap, math.ceil(row.getLong(0) * headroom).toLong)
  }

  /** Distinct candidate pairs (doc_a < doc_b) from the df-capped inverted
    * index over `ex` = (id, g). The two self-join inputs are identical
    * subplans, so the second side reuses the first's exchange. */
  def candidatePairs(ex: DataFrame, idCol: String, dfCap: Long): DataFrame = {
    val capped = ex.join(broadcast(hotShingles(ex, dfCap)), Seq("g"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard pairs in ONE pass over the df-capped inverted index —
    * the q46 plan. Shape matters: `join → groupBy(pair) → count` streams
    * pair counts through a hash aggregate without ever materializing,
    * deduplicating, or broadcasting the pair set (at sf0.1 the corpus
    * yields 1.1M shared-shingle pairs; a candidate-distinct + broadcast +
    * re-count formulation measured 25x slower and its lingering broadcast
    * degraded every query after it).
    *
    * Exactness under the cap: shared(a,b) = shared_capped(a,b) +
    * |hot(a) ∩ hot(b)|, where hot(d) is d's (few) above-cap shingles —
    * carried as a per-doc array and corrected with `array_intersect`, so
    * the reported Jaccard is computed over FULL shingle sets. The only
    * semantic delta vs uncapped: a pair sharing exclusively hot shingles
    * never surfaces (the oracle replays the same rule). */
  def cappedJaccardPairs(ex: DataFrame, idCol: String, dfCap: Long,
      dfCounts: Option[DataFrame] = None): DataFrame = {
    // hot is TINY by construction (≤ shingle rows / dfCap values) but sits
    // under three consumers (both anti-join sides of the self-join + the
    // hotDocs join); without a persist each consumer re-runs the full df
    // aggregate over ex — one extra pass per consumer, measured ~0.3 s each
    // at sf0.1. Released by the per-query clearCache() (bench/verify) or
    // the block manager's LRU. A caller that already aggregated the
    // vocabulary (adaptive cap) passes its [[shingleDf]] table in.
    val hot = dfCounts.fold(hotShingles(ex, dfCap))(
        _.where(col("_df") > dfCap).select(col("g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val carriedSizes = ex.columns.contains(SizeCol)
    val capped = ex.join(broadcast(hot), Seq("g"), "left_anti")
    // when ex carries per-doc sizes (shinglesWithSize), the denominators
    // ride through the self-join and the pair table never joins a sizes
    // side; otherwise (bare (id, g) input) fall back to a groupBy sizes
    // table joined on doc_a/doc_b — fine for small corpora, superlinear
    // once sizes stops broadcasting
    val sharedCapped =
      if (carriedSizes)
        // both denominators travel packed in ONE long grouping key instead
        // of two first() buffers: the pair aggregate's row shrinks from
        // (2 key longs + count + 2 first-buffers-with-flags) to (3 key
        // longs + count) — at sf0.1 this exchange carries 1.1M mostly-
        // unique pairs, so buffer bytes and update branches are the cost.
        // (na, nb are per-doc DISTINCT-shingle counts: ints by
        // construction, so 32 bits each is not a range assumption.)
        capped.as("a").join(capped.as("b"),
            col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol"))
          .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
            shiftleft(col(s"a.$SizeCol").cast("long"), 32)
              .bitwiseOR(col(s"b.$SizeCol").cast("long")).as("_nk"))
          .groupBy(col("doc_a"), col("doc_b"), col("_nk"))
          .agg(count(lit(1)).as("shared_c"))
          .withColumn("na", shiftright(col("_nk"), 32))
          .withColumn("nb", col("_nk").bitwiseAND(lit(0xffffffffL)))
          .drop("_nk")
      else {
        val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
        capped.as("a").join(capped.as("b"),
            col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol"))
          .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
          .agg(count(lit(1)).as("shared_c"))
          .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), "doc_a")
          .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), "doc_b")
      }
    finishJaccard(sharedCapped, ex, idCol, hot)
  }

  /** Shared tail of the capped-pair plans: exact hot-shingle correction
    * (shared += |hot(a) ∩ hot(b)|) and the Jaccard from carried
    * denominators. hotDocs rows are docs that CONTAIN hot shingles, with
    * their (small) hot-shingle arrays; plain shuffle joins — at scale this
    * table has one row per document at worst and must not be broadcast. */
  private def finishJaccard(sharedCapped: DataFrame, ex: DataFrame, idCol: String,
      hot: DataFrame): DataFrame = {
    val hotDocs = ex.join(broadcast(hot), Seq("g"))
      .groupBy(col(idCol)).agg(collect_set(col("g")).as("hs"))
    sharedCapped
      .join(hotDocs.select(col(idCol).as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"), "left")
      .join(hotDocs.select(col(idCol).as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"), "left")
      .withColumn("shared",
        col("shared_c") + when(col("hs_a").isNotNull && col("hs_b").isNotNull,
          size(array_intersect(col("hs_a"), col("hs_b")))).otherwise(lit(0)))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"))
  }

  // Two formulations of the pair stage were A/B-measured at sf0.1 and
  // rejected as neutral (round 4, 5 isolated reps each, vs 1.84-2.6 s for
  // the self-join form): (a) packing (doc_a, doc_b) into one long grouping
  // key — pack/unpack shifts offset the narrower key; (b) groupBy(g) +
  // collect_list + nested-transform pair generation instead of the
  // self-join — 2.05-5.8 s, the per-group array materialization costs what
  // the join probe saved. The join → groupBy(pair) shape stays.

  /** Exact Jaccard over full shingle sets, restricted to `cand` pairs —
    * the verify stage for SMALL candidate sets (q47's LSH banding emits
    * few candidates, so broadcasting them is the right plan; do NOT use
    * this with the raw inverted-index pair set — see [[cappedJaccardPairs]]).
    * With a [[shinglesWithSize]] input the Jaccard denominators ride
    * through the join (no sizes aggregate or joins at all). */
  def verifiedJaccard(ex: DataFrame, cand: DataFrame, idCol: String): DataFrame = {
    if (ex.columns.contains(SizeCol)) {
      ex.select(col(idCol).as("doc_a"), col(SizeCol).as("na"), col("g"))
        .join(broadcast(cand), Seq("doc_a"))
        .join(ex.select(col(idCol).as("doc_b"), col(SizeCol).as("nb"), col("g")),
          Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
        .withColumn("jaccard",
          col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
    } else {
      val sizes = ex.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      val shared = ex.select(col(idCol).as("doc_a"), col("g"))
        .join(broadcast(cand), Seq("doc_a"))
        .join(ex.select(col(idCol).as("doc_b"), col("g")), Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("jaccard",
          col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
    }
  }

  /** End-to-end: near-dup pairs with exact Jaccard >= `minJaccard`. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, dfCap: Long): DataFrame =
    cappedJaccardPairs(shinglesWithSize(df, idCol, textCol), idCol, dfCap)
      .where(col("jaccard") >= minJaccard)

  // ---- prefix filtering (AllPairs/PPJoin) for HIGH thresholds ------------

  /** PPJoin-style prefix index (SURVEY.md §9.4 #6; Bayardo et al. WWW'07,
    * Xiao et al. WWW'08 — public algorithms): in any global shingle order, two
    * documents with |A∩B| ≥ α must share an element within the first
    * |X|−α+1 of each. Jaccard ≥ τ implies |A∩B| ≥ ⌈τ·|X|⌉ for both sides,
    * so indexing only each document's first ⌊(1−τ)·|X|⌋+1 shingles is
    * LOSSLESS for J ≥ τ while shrinking the candidate index by ~τ — the
    * win the df-cap path can't offer at high thresholds (at the battery's
    * exploratory τ=0.25 the prefix keeps 75%+ and was measured not worth
    * it; at dedup-grade τ≥0.8 it drops 75%+ of index rows and the
    * quadratic join input shrinks accordingly).
    *
    * Canonical order = ascending document frequency, then shingle value
    * (PPJoin's rarest-first): prefixes hold each document's RAREST
    * shingles, which both minimizes candidate fan-out and keeps corpus-wide
    * stop-shingles out of the join — the hot-shingle problem solves itself
    * at high τ, no cap needed. Cost: one df aggregate (the capped path
    * pays the same) + one per-document sort of its own shingle list (a
    * size-bounded array_sort inside a hash aggregate, not a global sort).
    *
    * Input must be [[shinglesWithSize]] output (carried distinct counts). */
  def prefixIndex(ex: DataFrame, idCol: String, tau: Double): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1): $tau")
    require(ex.columns.contains(SizeCol), "prefixIndex needs shinglesWithSize input")
    // rank-within-document rather than collect_list + array_sort: the
    // window sorts each doc's rows in place instead of materializing a
    // per-document struct array, buffering only the prefix
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_df"), col("g"))
    ex.join(shingleDf(ex), Seq("g"))
      .withColumn("_rn", row_number().over(byRarity))
      .where(col("_rn") <= floor(lit(1.0 - tau) * col(SizeCol)) + 1)
      .select(col(idCol), col(SizeCol), col("g"))
  }

  /** Candidate pairs from the prefix index, with the PPJoin length filter
    * (J ≥ τ forces τ·max(|A|,|B|) ≤ min(|A|,|B|)) applied inside the join.
    * Complete for J ≥ τ by the prefix lemma; verify with
    * [[verifiedJaccard]] for exactness. */
  def prefixCandidates(ex: DataFrame, idCol: String, tau: Double): DataFrame = {
    val px = prefixIndex(ex, idCol, tau)
    px.as("a").join(px.as("b"),
        col("a.g") === col("b.g") && col(s"a.$idCol") < col(s"b.$idCol") &&
          least(col(s"a.$SizeCol"), col(s"b.$SizeCol")).cast("double") >=
            lit(tau) * greatest(col(s"a.$SizeCol"), col(s"b.$SizeCol")))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** End-to-end prefix-filtered near-dup pairs for high thresholds: prefix
    * candidates → exact verify over FULL shingle sets → J ≥ τ. Same output
    * contract as [[jaccardPairs]]; candidates at τ≥0.8 are few, so the
    * broadcast verify is the right plan. Shingles are 56-bit-hashed up
    * front (the same portable hashing every q46-family stage uses): the
    * index join, the per-document rarity rank, and the verify all compare
    * longs instead of multi-word strings — with the rank-not-collect
    * prefixIndex this measured 25 s → 13 s at 25k docs (PipelineScaleProbe
    * 5x); the prefix lemma needs only a consistent total order, which
    * (df, hash) still is. Cost model vs [[cappedJaccardPairs]]: the prefix
    * path pays a LINEAR df-join + per-doc rank the capped path doesn't
    * (~2x constant at probe scale), and in exchange its pair aggregate
    * sees only near-dup candidates instead of every shared-shingle pair —
    * the term that grows with corpus density and dominates at 100 TB. Use
    * capped for exploratory low τ, prefix for dedup-grade τ ≥ 0.8. */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      tau: Double): DataFrame = {
    graft.functions.TextOps.register(df.sparkSession)
    val ex = shinglesWithSize(df, idCol, textCol)
      .select(col(idCol), col(SizeCol),
        graft.functions.TextOps.h56Col(col("g")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verifiedJaccard(ex, prefixCandidates(ex, idCol, tau), idCol)
      .where(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"))
  }

  /** End-to-end with the cap derived from the corpus's own df distribution
    * ([[adaptiveDfCap]]) — the no-tuning entry point. The vocabulary
    * aggregate is computed ONCE (persisted) and serves both the percentile
    * and the hot set. */
  def jaccardPairsAdaptive(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame = {
    val ex = shinglesWithSize(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = shingleDf(ex)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cappedJaccardPairs(ex, idCol, adaptiveDfCapFrom(counts), dfCounts = Some(counts))
      .where(col("jaccard") >= minJaccard)
  }
}
