package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreOps, Curation, Pipeline, Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The battery is assembled from four modules:
  *   - [[graft.queries.CoreOps]]    q01-q05 + q73 + q76 + q77 + q92 + q101: the reference
  *     engine's own operator semantics (scan order, MVCC upsert, snapshot
  *     horizon, range pruning, count, the bucketed zero-exchange layout,
  *     SQL-native VERSION AS OF through the DSv2 GraftCatalog, and the
  *     zero-exchange ordered scan of the ranged layout) — the
  *     implementations live in [[graft.core]] / [[graft.sources]].
  *   - [[graft.queries.Relational]] q06-q39, q54, q58-q60, q74: full
  *     relational checklist incl. pivot/unpivot and both top-k UDAF tiers.
  *   - [[graft.queries.Pipeline]]   q40-q60, q75, q78, q83-q84, q88,
  *     q90, q93-q100: LLM-data-pipeline operators (text analysis, dedup
  *     family, similarity search incl. IVF-PQ, multimodal pHash, Gopher
  *     rules, BPE, SemDeDup batch + streaming gates, media near-dup).
  *   - [[graft.queries.Curation]]   q61-q72, q79-q81: curation/batch prep
  *     (sampling, sessions, scrubbing, repetition, caps, stats, TF-IDF,
  *     decontamination, passage dedup, Zipf, embedding profile,
  *     sequence packing, sliding-window chunking, epoch shuffle).
  */
object SparkEntry {
  private lazy val battery: Seq[Q.Entry] =
    CoreOps.entries ++ Relational.entries ++ Pipeline.entries ++ Curation.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    battery.find(_.name == "q16_pricing_summary").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    battery.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
