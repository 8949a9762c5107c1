package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact integer fixed-point arithmetic — the repo's second
  * iterative graph operator (alongside [[ConnectedComponents]]'s
  * large-star/small-star), for ranking inside a curation pipeline
  * (domain/source authority as a quality prior, link-graph weighting).
  *
  * All arithmetic is int64 floor division, so every iteration is
  * bit-reproducible on any engine: the total rank mass starts as
  * `totalUnits` integer units spread evenly, each step sends
  * `rank DIV outdeg` units down every out-edge, and the damping mix is
  * `base15 + (85 * inbound) DIV 100` with `base15 = (totalUnits DIV n) *
  * 15 DIV 100`. (Floor division leaks a few units of mass per step —
  * deterministically, identically everywhere; the classic float
  * formulation instead depends on summation order, which no distributed
  * engine should promise.) Dangling mass is dropped, not redistributed —
  * same contract both sides.
  *
  * Scale shape: one join + one map-side-combining sum per iteration —
  * the contribution join keys ranks against edges on `src` and
  * aggregates by `dst`; edges (with out-degree attached) are computed
  * once and cached. No driver-side state, no collect; 100 TB of edges is
  * iters × (shuffle-by-src + shuffle-by-dst).
  */
object PageRank {

  /** Rank `edges` (columns `src`, `dst`, both BIGINT; multi-edges count
    * multiply, self-loops allowed but conventionally pre-filtered) for
    * `iters` damped iterations. Returns (node, rank) with rank in integer
    * units of `totalUnits` initial mass.
    *
    * Lineage discipline: every `checkpointEvery` iterations the rank frame
    * is eagerly `localCheckpoint`ed — otherwise each iteration nests one
    * more join + aggregate into a single logical plan and Catalyst
    * re-analysis goes superlinear long before the data does (the same
    * discipline as [[ConnectedComponents]]). Truncation is
    * plan-surgery only; ranks are bit-identical with or without it.
    *
    * `convergeEarly = true` additionally stops once an iteration leaves
    * every rank unchanged (integer fixed-point DOES reach exact fixpoints,
    * unlike float PageRank) — detected with a one-job count + xor-of-hash
    * signature and confirmed with an exact `except()` only on signature
    * match. Off by default so a requested iteration count is exactly what
    * runs. */
  def run(edges: DataFrame, iters: Int, totalUnits: Long = 1000000000000L,
      checkpointEvery: Int = 8, convergeEarly: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1: $checkpointEvery")
    // damping multiplies by 85 before the DIV; bound the mass so the
    // per-node product can never overflow int64
    require(totalUnits >= 1 && totalUnits <= Long.MaxValue / 100L,
      s"totalUnits must be in [1, ${Long.MaxValue / 100L}]: $totalUnits")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // out-degree rides on every edge so the per-iteration join needs no
    // second lookup; both sides of the iteration join hash on `src`
    val withDeg = e.join(outdeg, "src").cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty edge set")
    val r0 = totalUnits / n
    val base15 = r0 * 15L / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    var prevSig: Option[(Long, Long)] = None
    var it = 0
    var done = false
    while (it < iters && !done) {
      val contrib = ranks.join(withDeg, ranks("node") === withDeg("src"))
        .select(col("dst").as("node"), expr("rank DIV od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      var next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base15) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("rank"))
      it += 1
      val truncate = it % checkpointEvery == 0 && it < iters
      if (truncate || convergeEarly) next = next.localCheckpoint(true)
      if (convergeEarly) {
        val s = next.agg(count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(col("node"), col("rank"))), lit(0L)).as("x"))
          .head
        val curSig = (s.getLong(0), s.getLong(1))
        if (prevSig.contains(curSig) && next.except(ranks).isEmpty) done = true
        prevSig = Some(curSig)
      }
      ranks = next
    }
    ranks
  }
}
