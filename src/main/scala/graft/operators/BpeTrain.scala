package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016), the
  * Spark-shaped way: the corpus is touched ONCE (tokenize + word-count
  * aggregate); every merge iteration then runs over the word-frequency
  * VOCABULARY — typically 10^5..10^6 rows regardless of corpus size, the
  * same corpus-vs-model asymmetry the IVF trainer exploits. Per iteration:
  * adjacent-pair count aggregate → collect the single argmax row → apply
  * the merge with a fold over each word's symbol array. Driver traffic is
  * one row per merge; the vocabulary never leaves the executors
  * (localCheckpoint bounds plan depth, not data movement).
  *
  * Determinism: ties on pair count break by (a, b) lexicographic order, so
  * the learned merge table is a pure function of the corpus.
  */
object BpeTrain {

  /** (w, c): corpus word frequencies — ASCII-lowercase tokens, the one
    * corpus-sized aggregate of the whole training run. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Adjacent character-pair counts weighted by word frequency — the first
    * BPE iteration's statistic, exact. Input (w, c); output (pair, cnt),
    * count-descending with lexicographic tiebreak. */
  def pairCounts(wc: DataFrame): DataFrame =
    wc.where(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")).as("pair"),
        col("c"))
      .groupBy("pair").agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))

  /** Learn `nMerges` merges from a (w, c) word-frequency table. Returns the
    * ranked merge list; stops early if no pair occurs twice.
    *
    * Hybrid execution (the ConnectedComponents.localSolve pattern): the
    * (w, c) table is VOCAB-sized — 10^5..10^6 rows whatever the corpus — so
    * when it fits under `localThreshold` rows we collect it once and run
    * the whole merge loop driver-locally with incremental pair-count
    * maintenance: 2 Spark jobs total (count + collect) instead of 2 per
    * merge (a 32k-merge production vocabulary would otherwise be ~64k
    * sequential jobs).
    *
    * Above the threshold — a RAW-corpus vocabulary (10^8..10^9 distinct
    * "words") — [[trainWithFloor]] keeps the job count O(1): train on the
    * ≤`localThreshold` most frequent words and bound the ignored tail's
    * influence exactly (see its scaladoc for the certificate). Every path
    * shares the exact statistic and the (cnt desc, then UTF-8-binary
    * (a, b)) argmax tiebreak — the same total order as the distributed
    * `orderBy(cnt.desc, a, b)` — so the learned sequence is a pure
    * function of the corpus; BpeTrainSpec pins local ≡ distributed and
    * floor ≡ full under the certificate. */
  def train(wc: DataFrame, nMerges: Int,
      localThreshold: Long = 2000000L): Seq[(String, String)] = {
    require(localThreshold >= 1, s"localThreshold must be >= 1, got $localThreshold")
    if (wc.count() <= localThreshold) {
      val rows = wc.select(col("w").cast("string"), col("c").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(rows, nMerges)
    } else trainWithFloor(wc, nMerges, localThreshold).merges
  }

  /** Outcome of the frequency-floor path: the merges, the floor `f` used
    * (words with count < f were excluded), how many head words trained,
    * the exact upper bound `tailMass` on any single pair count the
    * excluded tail could contribute, the smallest argmax decision gap
    * seen, and whether that makes the sequence PROVABLY identical to
    * full-vocabulary training. */
  final case class FloorTrain(merges: Seq[(String, String)], floor: Long,
      headWords: Long, tailMass: Long, minGap: Long, certifiedExact: Boolean)

  /** Exact-statistic BPE over the ≤`headLimit` most frequent words, with
    * the excluded tail's influence bounded, in O(1) Spark jobs however
    * many merges are requested (count histogram + head collect).
    *
    * The floor `f` is the smallest count whose head {w : c(w) ≥ f} fits
    * `headLimit`. Each excluded word contributes at most c(w)·(|w|−1)
    * occurrences to any single pair count at ANY merge state (merging
    * never increases a word's adjacent-pair slots), so
    * `tailMass = Σ_tail c(w)·(|w|−1)` bounds the tail's contribution to
    * every pair. If at every step the winner's count exceeds the
    * runner-up's by MORE than `tailMass` (and exceeds `tailMass` itself,
    * so no tail-only pair can win), no tail assignment can change any
    * argmax — the head-trained sequence equals full-vocabulary training
    * exactly, and `certifiedExact` says so. Otherwise the sequence is the
    * standard frequency-floor approximation with its error bounded by the
    * reported `tailMass` (the common trade in production tokenizer
    * pipelines, which drop hapax/sub-floor words outright). */
  def trainWithFloor(wc: DataFrame, nMerges: Int,
      headLimit: Long): FloorTrain = {
    // count histogram: tiny result (distinct counts), one aggregate over
    // the vocab; mass = Σ c·(|w|-1) per count class, in code points
    val histRows = wc
      .select(col("c").cast("long").as("c"),
        (length(col("w")) - lit(1)).cast("long").as("slots"))
      .groupBy("c")
      .agg(count(lit(1)).as("nw"), sum(greatest(col("slots"), lit(0)) * col("c")).as("mass"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    // admit whole count classes from the most frequent down, stopping at
    // the first that does not fit: the head must be count-contiguous or
    // "count ≥ floor" would not describe it
    var acc = 0L
    var floor = Long.MaxValue
    var full = false
    histRows.foreach { case (c, nw, _) =>
      if (!full && acc + nw <= headLimit) { acc += nw; floor = c }
      else full = true
    }
    require(floor != Long.MaxValue,
      s"headLimit $headLimit admits no complete count class; raise it " +
        s"(largest class has ${histRows.headOption.map(_._2).getOrElse(0L)} words)")
    val tailMass = histRows.collect { case (c, _, m) if c < floor => m }.sum
    val head = wc.where(col("c") >= floor)
      .select(col("w").cast("string"), col("c").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (merges, minGap) = trainLocalWithGap(head, nMerges)
    val certified = minGap > tailMass &&
      (merges.length == nMerges || tailMass < 2L)
    FloorTrain(merges, floor, head.length.toLong, tailMass, minGap, certified)
  }

  /** One symbol per Unicode CODE POINT — matching the executor-side
    * `split(w, '')`, which splits UTF8String characters, never UTF-16
    * code units (a surrogate pair is ONE symbol on both paths). */
  private[operators] def toSymbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** UTF-8 byte order — the binary collation Spark's `orderBy` applies to
    * strings. Differs from Java's UTF-16 `compareTo` exactly where it
    * matters: supplementary code points sort ABOVE U+E000..U+FFFF in
    * UTF-8/code-point order but below them in UTF-16 order. */
  private[operators] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-local merge loop with incremental pair maintenance: pair counts
    * and a pair→words index are adjusted only for the words a merge actually
    * touches (Sennrich et al.'s trick), so each merge costs O(affected
    * words × word length), not a full vocabulary pass. */
  private[operators] def trainLocal(wcRows: Array[(String, Long)],
      nMerges: Int): Seq[(String, String)] =
    trainLocalWithGap(wcRows, nMerges)._1

  /** [[trainLocal]] also reporting the smallest decision gap — min over
    * steps of (winner count − best other count) — the quantity
    * [[trainWithFloor]]'s exactness certificate compares to the tail
    * mass. A step with a single live pair counts its full count as gap. */
  private[operators] def trainLocalWithGap(wcRows: Array[(String, Long)],
      nMerges: Int): (Seq[(String, String)], Long) = {
    import scala.collection.mutable
    val words: Array[Array[String]] = wcRows.map { case (w, _) => toSymbols(w) }
    val counts: Array[Long] = wcRows.map(_._2)
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def touch(i: Int, sign: Long): Unit = {
      val sym = words(i)
      var j = 0
      while (j < sym.length - 1) {
        val p = (sym(j), sym(j + 1))
        val nv = pairCnt.getOrElse(p, 0L) + sign * counts(i)
        if (nv == 0L) pairCnt.remove(p) else pairCnt(p) = nv
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        else pairWords.get(p).foreach(_ -= i)
        j += 1
      }
    }
    words.indices.foreach(touch(_, 1L))
    val merges = Seq.newBuilder[(String, String)]
    var minGap = Long.MaxValue
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      // deterministic argmax: max count, ties by (a, b) ascending in
      // UTF-8 BINARY order — the same total order as the distributed
      // orderBy(cnt desc, a, b)
      var bp: (String, String) = null
      var bc = 0L
      var second = 0L
      pairCnt.foreach { case (p, c) =>
        if (bp == null || c > bc || (c == bc &&
            (utf8Less(p._1, bp._1) ||
              (p._1 == bp._1 && utf8Less(p._2, bp._2))))) {
          if (bp != null) second = math.max(second, math.min(bc, c))
          bp = p; bc = c
        } else second = math.max(second, c)
      }
      if (bp == null || bc < 2L) done = true
      else {
        minGap = math.min(minGap, bc - second)
        merges += bp
        val affected = pairWords.getOrElse(bp, mutable.BitSet.empty).toArray
        affected.foreach { i =>
          touch(i, -1L)
          words(i) = applyMergeLocal(words(i), bp._1, bp._2)
          touch(i, 1L)
        }
      }
      m += 1
    }
    (merges.result(), minGap)
  }

  /** One leftmost non-overlapping merge pass — the local twin of
    * `mergeFold` ("aaa" under (a,a) → ["aa","a"], pinned in
    * BpeTrainSpec). */
  private def applyMergeLocal(sym: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** The distributed per-merge loop: adjacent-pair aggregate → 1-row argmax
    * collect → fold-expression merge, vocabulary never leaving the
    * executors. Exact at ANY vocabulary size but 2 Spark jobs per merge —
    * kept as the reference implementation the specs cross-check
    * [[trainLocal]] and [[trainWithFloor]] against; [[train]] itself
    * never pays its per-merge job cost anymore. */
  private[operators] def trainDistributed(wc: DataFrame,
      nMerges: Int): Seq[(String, String)] = {
    var vocab = wc.select(expr("filter(split(w, ''), s -> s != '')").as("sym"),
      col("c")).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = vocab.where(size(col("sym")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(sym)-2), i -> struct(sym[i] AS a, sym[i+1] AS b))"))
          .as("p"), col("c"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val next = vocab.select(mergeFold(col("sym"), a, b).as("sym"), col("c"))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    vocab.unpersist()
    merges.result()
  }

  /** Leftmost non-overlapping merge of adjacent (a, b) into a+b, as a fold
    * over the symbol array: merging consumes the left symbol, so an
    * overlapping run like "aaa" under (a,a) yields ["aa","a"], matching
    * the reference BPE implementations. */
  private[operators] def mergeFold(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Tokenize one word with a learned merge list (driver-side; the merge
    * table is model-sized). Applies merges in learned rank order, each as
    * a full leftmost non-overlapping pass. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var sym: Seq[String] = toSymbols(word).toSeq
    merges.foreach { case (a, b) =>
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += sym(i); i += 1 }
      }
      sym = out.result().toIndexedSeq
    }
    sym
  }

  /** Distributed encode: (w) → (w, tokens). The merge list rides the
    * closure (broadcast-small, like the IVF centroid table); the per-word
    * rank-ordered merge loop is genuinely imperative, so a typed map beats
    * a tower of N fold expressions. */
  def encode(words: DataFrame, merges: Seq[(String, String)],
      wordCol: String = "w"): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val m = merges.toIndexedSeq
    words.select(col(wordCol)).as[String]
      .map(w => (w, encodeWord(w, m)))
      .toDF(wordCol, "tokens")
  }
}
