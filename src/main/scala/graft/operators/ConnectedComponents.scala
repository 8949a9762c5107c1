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
    * `maxIter` star rounds (default 25 ≈ log₂ of anything storable).
    *
    * Hybrid finish: star rounds contract the canonical edge set
    * geometrically; once it fits under `localThreshold` edges the loop
    * stops paying O(log n) scheduling rounds and finishes with a driver
    * union-find over the CONTRACTED graph — bounded memory (16 B/edge ≈
    * 64 MB at the 4M default), identical fixpoint (components are
    * preserved by every star round, so component-min of the contracted
    * graph IS component-min of the original). Near-dup graphs at battery
    * scale cut over immediately; a 100 TB corpus runs distributed rounds
    * until the frontier is small. `localThreshold = 0` forces the pure
    * distributed path (spec'd equivalent). */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, localThreshold: Long = 4L << 20): DataFrame = {
    // canonical working set: (u, v) with u > v — "u points down to v".
    // Each round ends in localCheckpoint (eager): iterative DataFrame
    // plans otherwise grow by two joins + three aggregates per round and
    // Catalyst re-analysis goes superlinear long before the data does.
    // On a real cluster swap for reliable checkpoint() if executor loss
    // during the (short) loop matters.
    // materialize the caller's edge list once: it feeds both the canonical
    // working set and the node universe, and upstream pair generation
    // (LSH banding, Hamming joins) is far more expensive than one linear
    // checkpoint write
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .localCheckpoint(true)
    var cur = normalize(e).localCheckpoint(true)
    var sig = signature(cur)
    var converged = sig._1 <= localThreshold
    var it = 0
    while (!converged && it < maxIter) {
      // LARGE-STAR on the symmetric view: for each center u, link every
      // strictly-larger neighbor to m(u) = min(Γ(u) ∪ {u}). Then
      // SMALL-STAR on the downward orientation: for each center u, link
      // its smaller neighborhood (and u itself) to its minimum.
      val next = normalize(smallStar(largeStar(cur))).localCheckpoint(true)
      // the canonical edge set is the state: star rounds only ever lower
      // labels, so an unchanged set IS the fixpoint. Detect it with a
      // one-job aggregate signature (count + xor of xxhash64) and confirm
      // with an exact except() only when the signature matches — the
      // except runs once, at the fixpoint, instead of every round.
      val sigNext = signature(next)
      converged = sigNext._1 <= localThreshold ||
        (sigNext == sig && next.except(cur).isEmpty)
      cur.unpersist()
      cur = next
      sig = sigNext
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    val labeled =
      if (sig._1 <= localThreshold) localSolve(cur)
      // at the distributed fixpoint every canonical edge is already
      // (node, componentMin)
      else cur.select(col("u").as("node"), col("v").as("rep"))
    // the minima themselves (and nodes that only ever appeared in
    // self-loops) have no labeled row — the universe left join labels
    // them with themselves, making the output total over the input's
    // nodes.
    val universe = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
    universe.join(labeled, Seq("node"), "left")
      .select(col("node"), coalesce(col("rep"), col("node")).as("rep"))
  }

  /** Finish a small contracted graph on the driver: min-rooted union-find
    * with path compression. Only called under `localThreshold` edges. */
  private def localSolve(canonical: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val p = parent.get(c); parent.put(c, r); c = p }
      r
    }
    canonical.collect().foreach { row =>
      val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    parent.keySet.forEach { k => val r = find(k); if (r != k) out += ((k, r)) }
    val spark = canonical.sparkSession
    import spark.implicits._
    out.toSeq.toDF("node", "rep")
  }

  /** Dedup cut list: every node of `edges` that is NOT its component's
    * minimum — drop these, keep the representatives. */
  def cutList(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    labels(edges, srcCol, dstCol).where(col("node") =!= col("rep"))

  /** Order-independent set identity: (row count, XOR of per-row xxhash64 —
    * commutative, overflow-free under ANSI, and rows are distinct so no
    * self-cancellation). One cheap job over an already-checkpointed set;
    * equal signatures trigger the exact except() confirmation in
    * [[labels]]. */
  private def signature(canonical: DataFrame): (Long, Long) = {
    val r = canonical
      .agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

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
