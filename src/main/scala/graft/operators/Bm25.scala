package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable BM25 full-text search over an
  * inverted index.
  *
  * [[index]] builds the three classic relations in one pass over the
  * corpus — postings (term, doc_id, tf), lexicon (term, df), doc stats
  * (doc_id, dl) — and [[search]] scores a term query against them with a
  * FIXED-POINT BM25 variant (battery q105's oracle replays it exactly):
  *
  *   w(t)        = (N - df + 0.5) / (df + 0.5)        RSJ weight, log-free
  *   tfn(t, d)   = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *   contrib     = floor(tfn · w · 2^20)              int64 per (d, t)
  *   score(d)    = Σ_t contrib                        int64 sum, exact
  *
  * Why this exact shape: per-row IEEE-754 +,·,/ on identical operands is
  * bit-identical in any engine, floor is exact, and the cross-term SUM —
  * the only place float addition order could leak in — happens in int64,
  * so the score is hash-exact across engines (Q.scala's battery rules).
  * The standard `ln`-based idf is deliberately NOT used: transcendentals
  * are libm-dependent and a 1-ULP wobble under a floor is a flipped gate.
  * The RSJ ratio without log is the same monotone per-term ordering
  * (Robertson & Zaragoza, "The probabilistic relevance framework: BM25
  * and beyond", Found. Trends IR 3(4), 2009, §3.3 — the log is a
  * monotone transform of the RSJ odds ratio); absolute scores weight rare
  * terms more steeply than Lucene's, which a ranking gate does not care
  * about. k1 = 1.2, b = 0.75 (the universal defaults).
  *
  * Scale shape: the index is three hash aggregates over exploded tokens
  * (map-side combine collapses each partition's duplicate (doc, term)
  * pairs before any shuffle). A search touches ONLY the query terms'
  * postings — the term filter lands on the postings scan (pushed to
  * parquet when the index is persisted, term-bucketed for locality), the
  * ≤|q|-row lexicon slice and 1-row corpus stats broadcast, and the
  * per-doc sum is one aggregate over |matching postings| rows. At 100 TB
  * the query cost is proportional to the query terms' document
  * frequency, never to the corpus.
  */
object Bm25 {

  /** Fixed-point scale: contributions are floor(x · 2^20). */
  val Scale: Long = 1L << 20

  // k1 = 1.2, b = 0.75. Every float constant below appears as a PARSED
  // LITERAL (1.2, 2.2, 0.25, 0.75), never as Scala-side arithmetic:
  // decimal→binary64 parsing is correctly rounded and thus identical in
  // any engine, while e.g. nearest(1.2) + 1.0 could round differently
  // from nearest(2.2). The oracle SQL uses the same literals with the
  // same parenthesization, so every intermediate double is bit-identical.

  /** The whitespace tokenizer every battery text query shares. */
  private def toks(c: Column): Column = split(lower(c), "\\s+")

  /** Inverted index: postings (term, doc_id, tf), lexicon (term, df),
    * docs (doc_id, dl). One token explosion, three aggregates. */
  def index(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val tokens = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("term"))
    val postings = tokens.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val lexicon = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val docs = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    (postings, lexicon, docs)
  }

  /** Top-k docs for a bag of query terms, scored by fixed-point BM25.
    * Ties break on doc_id, so the result is a total order. */
  def search(postings: DataFrame, lexicon: DataFrame, docs: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    // 1-row corpus stats: N and avgdl (double division of exact int64
    // operands — IEEE-identical in any engine); broadcast everywhere
    val stats = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"), (col("sumdl").cast("double") / col("n").cast("double")).as("avgdl"))
    val qterms = terms.distinct
    val matched = postings.where(col("term").isin(qterms: _*))
      .join(broadcast(lexicon.where(col("term").isin(qterms: _*))), "term")
      .join(docs, "doc_id")
      .crossJoin(broadcast(stats))
    val tfD = col("tf").cast("double")
    val w = ((col("n").cast("double") - col("df").cast("double")) + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfn = (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl").cast("double")) / col("avgdl")))
    matched
      .select(col("doc_id"),
        floor((tfn * w) * lit(1048576.0)).cast("long").as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("matched_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
