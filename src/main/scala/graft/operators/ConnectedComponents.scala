package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns near-dup
  * PAIRS (NearDup / SimHashBands / HyperplaneLsh output) into dedup
  * CLUSTERS, so a 100 TB corpus can keep exactly one representative per
  * group of mutual near-duplicates. The reference has no graph operator;
  * this is the standard companion of its dedup story at pipeline scale.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log n) rounds even on path graphs, where naive min-label propagation
  * needs O(diameter). Each round is TWO hash aggregations and two joins on
  * the edge list, with no per-node neighbor materialization: the star
  * minimum comes from an aggregate joined back to the edges, never a
  * `collect_list`, so a celebrity node with 10^9 neighbors costs a skewed
  * aggregate (AQE-splittable) instead of an OOM'd task.
  *
  * Determinism: the fixpoint (every node labeled with its component's
  * minimum node id) is unique regardless of iteration order or
  * partitioning — safe for the oracle battery and for reproducible
  * training-data cuts.
  */
object ConnectedComponents {

  /** (node, rep) for every node appearing in `edges`, where rep is the
    * MINIMUM node id of the node's connected component (rep = node for the
    * minimum itself). Edges are treated as undirected; self-loops and
    * duplicates are tolerated. Fails if convergence needs more than
    * `maxIter` star rounds (default 25 ≈ log₂ of anything storable). */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // canonical working set: (u, v) with u > v — "u points down to v".
    // Each round ends in localCheckpoint (eager): iterative DataFrame
    // plans otherwise grow by two joins + three aggregates per round and
    // Catalyst re-analysis goes superlinear long before the data does.
    // On a real cluster swap for reliable checkpoint() if executor loss
    // during the (short) loop matters.
    var cur = normalize(
      edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v")))
      .localCheckpoint(true)
    var n = cur.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // LARGE-STAR on the symmetric view: for each center u, link every
      // strictly-larger neighbor to m(u) = min(Γ(u) ∪ {u}). Then
      // SMALL-STAR on the downward orientation: for each center u, link
      // its smaller neighborhood (and u itself) to its minimum.
      val next = normalize(smallStar(largeStar(cur))).localCheckpoint(true)
      val nNext = next.count()
      // the canonical edge set is the state: star rounds only ever lower
      // labels, so an unchanged set IS the fixpoint. except() is exact;
      // both sides are already deduped aggregates of the same size class.
      converged = nNext == n && next.except(cur).isEmpty
      cur.unpersist()
      cur = next
      n = nNext
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // at the fixpoint every canonical edge is (node, componentMin); the
    // minima themselves (and nodes that only ever appeared in self-loops)
    // have no u-side row — the universe left join labels them with
    // themselves, making the output total over the input's nodes.
    val universe = edges.select(col(srcCol).cast("long").as("node"))
      .union(edges.select(col(dstCol).cast("long").as("node"))).distinct()
    universe.join(cur.select(col("u").as("node"), col("v").as("rep")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("rep"), col("node")).as("rep"))
  }

  /** Dedup cut list: every node of `edges` that is NOT its component's
    * minimum — drop these, keep the representatives. */
  def cutList(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    labels(edges, srcCol, dstCol).where(col("node") =!= col("rep"))

  /** Dedup to canonical undirected form: u > v, no self-loops, distinct.
    * One hash aggregate. */
  private def normalize(edges: DataFrame): DataFrame =
    edges.where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

  /** m(u) = min over the full symmetric neighborhood (u itself included by
    * construction: on the symmetric view every neighbor pair contributes
    * both directions, and least(v, u) folds the center in). */
  private def starMin(sym: DataFrame): DataFrame =
    sym.groupBy("u").agg(min(least(col("v"), col("u"))).as("m"))

  /** Large-star: symmetric neighborhoods; every neighbor v > u links to
    * m(u). Output may be non-canonical; callers re-normalize. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.join(starMin(sym), Seq("u"))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: downward orientation (input is canonical u > v); every
    * smaller neighbor AND the center link to m(u) = min of the downward
    * neighborhood. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val norm = normalize(edges)
    val m = norm.groupBy("u").agg(min(col("v")).as("m"))
    val relink = norm.join(m, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
    val center = m.select(col("u"), col("m").as("v"))
    relink.union(center)
  }
}
