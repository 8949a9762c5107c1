package graft.core

import java.nio.file.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The read path: union of visible segment files → MVCC version resolution →
  * (optionally) key order. This ~40-line plan IS the reference's entire query
  * engine — its k-way ordered merge + newest-wins dedup (scan.rs:55-238).
  *
  * Spark-first design notes (SURVEY.md §2.1 #1-#4):
  *   - The k-way merge disappears: a union of parquet files is free, and
  *     Catalyst plans the dedup as one hash aggregate keyed on the
  *     dimensions — map-side partial aggregation means each segment's
  *     duplicates collapse before the shuffle, so shuffled bytes ≈ live rows,
  *     not total rows. At 100 TB this beats a global sort-merge (a window
  *     `row_number()=1` formulation would sort every partition; `max_by`
  *     needs no sort at all).
  *   - Block skipping is parquet row-group min/max stats + Hive partition
  *     pruning on the `_ck_*` chunk-key directories; `pruned` rewrites
  *     dimension predicates onto chunk keys so pruning kicks in before IO
  *     (the reference's scan.rs:119-180, done declaratively).
  *   - Version resolution implements the documented intent — highest
  *     (txnId, seq) wins (scan.rs:38-54) — not the reference's accidental
  *     insertion-order tie-break (scan.rs:162); SURVEY.md §7.4.
  */
object Scan {
  val TxnCol = "_txn_id"
  val SeqCol = "_seq"
  val DelCol = "_del"
  val ChunkPrefix = "_ck_"

  /** The read schema every layout's segment files share: the logical
    * columns (nullable — parquet reads never enforce non-null) plus the
    * `_del` tombstone marker and the `_txn_id`/`_seq` provenance pair. One
    * definition, consumed by the directory layout ([[raw]], which appends
    * chunk-key columns), the DSv2 catalog, and the ranged layout — a
    * provenance change lands in all three or none.
    *
    * `_del` is nullable by design: segments written before deletes existed
    * (and layouts that never write tombstones) simply lack the column, the
    * explicit read schema surfaces it as null, and [[dedup]] coalesces
    * null → false — old data reads unchanged, byte-for-byte. */
  def provenanceStruct(schema: MatSchema): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(schema.toStructType.fields.map(_.copy(nullable = true)) ++
      Seq(StructField(DelCol, BooleanType),
        StructField(TxnCol, LongType), StructField(SeqCol, LongType)))
  }

  /** Read the raw union of segment dirs + extra in-memory batches, with
    * `_txn_id`/`_seq` provenance columns present. `paths` are the segment
    * directories to read — resolved by the caller through the table's
    * [[Protocol]], so this layer is protocol-agnostic. */
  def raw(
      spark: SparkSession,
      schema: MatSchema,
      paths: Seq[String],
      extra: Seq[DataFrame]): DataFrame = {
    // chunk-key partition columns ride along so chunk predicates can prune;
    // cast defends against partition-column type inference (int vs long).
    // Dimension columns carry their chunk size as attribute metadata so
    // graft.plans.ChunkPruneRule can derive chunk predicates automatically.
    val dimCols = schema.dimensions.map { dim =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(MatSchema.ChunkKey, dim.chunkSize).build()
      col(dim.name).as(dim.name, md)
    }
    val cols = dimCols ++ schema.valueNames.map(col) ++
      schema.chunkColNames.map(c => col(c).cast("long").as(c)) ++
      Seq(col(DelCol), col(TxnCol), col(SeqCol))
    // One read per segment dir (each is its own Hive-partitioned tree); the
    // union of parquet scans collapses into a single multi-file scan stage.
    // The schema is supplied explicitly — never inferred: a transaction
    // that flushed zero rows leaves a data-file-less segment, which schema
    // inference would refuse (and at scale, skipping footer-based inference
    // also saves a listing round-trip per segment).
    import org.apache.spark.sql.types._
    val readSchema = StructType(
      provenanceStruct(schema).fields ++
        schema.chunkColNames.map(StructField(_, LongType)))
    val fromDisk = paths.map(p => spark.read.schema(readSchema).parquet(p).select(cols: _*))
    val all = fromDisk ++ extra.map(_.select(cols: _*))
    if (all.isEmpty) {
      import org.apache.spark.sql.types._
      val st = StructType(schema.toStructType.fields ++
        schema.chunkColNames.map(StructField(_, LongType)) ++
        provenanceStruct(schema).fields.takeRight(3))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    } else all.reduce(_ unionByName _)
  }

  /** Newest-wins version resolution: one aggregate, no join, no global sort.
    *
    * The version order (_txn_id, _seq) is packed into a single long `_ver` so
    * each value column resolves via `max_by(value, _ver)` with a primitive
    * aggregation buffer — that keeps the plan on `HashAggregateExec`
    * (a `max_by(struct, struct)` formulation has an immutable struct buffer
    * and silently degrades to `SortAggregateExec`, an O(n log n) sort per
    * partition at scale). `_ver` is unique per (key, version) so all value
    * columns pick the same winning row. Packing: txn in the high bits
    * (saturated at 2^40), seq in the low 22 bits — the in-memory
    * Long.MaxValue txn tag maps to 2^62+seq, overflow-free and still above
    * every committed version. */
  def dedup(df: DataFrame, schema: MatSchema): DataFrame = {
    val dims = schema.dimNames.map(col)
    val hasDel = df.columns.contains(DelCol)
    if (schema.valueNames.isEmpty && !hasDel) df.select(dims: _*).distinct()
    else {
      val ver = (least(col(TxnCol), lit(1L << 40)) * lit(1L << 22) +
        least(col(SeqCol), lit((1L << 22) - 1))).as("_ver")
      // the winning row's tombstone flag rides through the SAME aggregate
      // (one more primitive max_by buffer — still HashAggregateExec, still
      // one exchange); coalesce happens per-row so a winner from a
      // pre-delete segment (null _del) reads as live
      val valueAggs = schema.valueNames.map(v => max_by(col(v), col("_ver")).as(v))
      val delAgg =
        if (hasDel) Seq(max_by(coalesce(col(DelCol), lit(false)), col("_ver")).as(DelCol))
        else Nil
      val aggs = valueAggs ++ delAgg
      val resolved = df.withColumn("_ver", ver)
        .groupBy(dims: _*)
        .agg(aggs.head, aggs.tail: _*)
      val live = if (hasDel) resolved.filter(!col(DelCol)) else resolved
      live.select((schema.dimNames ++ schema.valueNames).map(col): _*)
    }
  }

  /** Full read path. `pred` (if any) is applied BEFORE version resolution —
    * this is only sound for predicates over dimension/chunk columns (all
    * versions of a key share them), which is exactly what [[chunkRange]]
    * produces; it is what lets partition pruning + parquet pushdown skip IO. */
  def resolve(
      spark: SparkSession,
      schema: MatSchema,
      paths: Seq[String],
      extra: Seq[DataFrame],
      pred: Option[Column] = None): DataFrame = {
    val base = raw(spark, schema, paths, extra)
    dedup(pred.fold(base)(base.filter), schema)
  }

  /** Rewrite a dimension range predicate onto the chunk-key partition column
    * too, so Hive partition pruning (directory-level skip) fires in addition
    * to parquet row-group stats — the declarative analog of the reference's
    * block-skipping queue (scan.rs:119-180). Use:
    * `db.snapshot().where(Scan.chunkPruned(schema, "t", $"t" >= 100 && $"t" < 200, 100L))`
    */
  def chunkRange(schema: MatSchema, dim: String, lo: Option[Long], hi: Option[Long]): Column = {
    val chunk = schema.dimensions.find(_.name == dim)
      .getOrElse(throw new IllegalArgumentException(s"no dimension $dim")).chunkSize
    val ck = col(schema.chunkColName(dim))
    val d = col(dim)
    val conds =
      lo.toSeq.flatMap(v => Seq(d >= v, ck >= Math.floorDiv(v, chunk))) ++
        hi.toSeq.flatMap(v => Seq(d <= v, ck <= Math.floorDiv(v, chunk)))
    conds.reduce(_ && _)
  }
}
