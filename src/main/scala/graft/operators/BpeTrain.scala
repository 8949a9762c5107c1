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
    * ranked merge list; stops early if no pair occurs twice. */
  def train(wc: DataFrame, nMerges: Int): Seq[(String, String)] = {
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
