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
    * sequential jobs). Above the threshold, the distributed per-merge loop
    * keeps the vocabulary on the executors. Both paths share the exact
    * statistic and the (cnt desc, a, b) argmax tiebreak, so the learned
    * merge sequence is identical — BpeTrainSpec pins this. */
  def train(wc: DataFrame, nMerges: Int,
      localThreshold: Long = 2000000L): Seq[(String, String)] = {
    if (wc.count() <= localThreshold) {
      val rows = wc.select(col("w").cast("string"), col("c").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(rows, nMerges)
    } else trainDistributed(wc, nMerges)
  }

  /** Driver-local merge loop with incremental pair maintenance: pair counts
    * and a pair→words index are adjusted only for the words a merge actually
    * touches (Sennrich et al.'s trick), so each merge costs O(affected
    * words × word length), not a full vocabulary pass. */
  private[operators] def trainLocal(wcRows: Array[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      wcRows.map { case (w, _) => w.map(_.toString).toArray }
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
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      // deterministic argmax: max count, ties by (a, b) ascending — the
      // same total order as the distributed orderBy(cnt desc, a, b)
      var bp: (String, String) = null
      var bc = 0L
      pairCnt.foreach { case (p, c) =>
        if (bp == null || c > bc || (c == bc &&
            (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2)))) { bp = p; bc = c }
      }
      if (bp == null || bc < 2L) done = true
      else {
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
    merges.result()
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
    * executors. Used when the vocabulary exceeds the driver threshold. */
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
    var sym = word.map(_.toString)
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
