package graft.core

import org.apache.spark.sql.types._

/** Schema of a graft table: N integer *dimension* (key) columns, each with a
  * chunk size, plus M *value* columns of arbitrary Spark type.
  *
  * Mirrors the reference's `Schema { dimensions, values }`
  * (reference: schema.rs:21-25) with two deliberate generalizations:
  *   - value columns may be any Spark type (the reference supports only
  *     `usize`, lib.rs:27);
  *   - multiple value columns actually work (the reference declares them but
  *     its block layout collapses them to one cell — see SURVEY.md §1.4).
  *
  * Dimensions are non-nullable LongType (coordinates; reference block.rs:9);
  * values are nullable (reference block.rs:10). Chunk sizes recreate the
  * reference's axis-aligned hyper-rectangle chunking
  * (`key = dim / chunk_size`, schema.rs:28-38) as Hive partition columns, so
  * Catalyst partition pruning replaces the reference's hand-rolled block
  * skipping (scan.rs:119-180).
  *
  * Persistence: the whole schema round-trips through a single
  * `StructType.json` document — chunk sizes ride in per-field metadata — so
  * no external JSON library is needed (reference persists schema.json,
  * schema.rs:40-55).
  */
final case class Dimension(name: String, chunkSize: Long) {
  require(chunkSize > 0, s"chunkSize must be positive for dimension $name")
  // dimension names ride in chunk-directory names (`_ck_<dim>=<v>`) which
  // the manifest protocol embeds in its JSON UNQUOTED-escaped and parses
  // back with a scoped regex — restrict them to a safe identifier so a
  // quote/bracket/separator in a name can never corrupt a manifest (value
  // column names are unrestricted: they only travel via StructType.json,
  // which escapes properly)
  require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
    s"dimension name '$name' must match [A-Za-z_][A-Za-z0-9_]* — it is " +
      "embedded in chunk-directory and manifest names")
}
final case class ValueCol(name: String, dataType: DataType = LongType)

final case class MatSchema(dimensions: Seq[Dimension], values: Seq[ValueCol],
    dropped: Seq[String] = Nil) {
  require(dimensions.nonEmpty, "at least one dimension required")
  private val allNames = dimensions.map(_.name) ++ values.map(_.name)
  require(allNames.distinct.size == allNames.size, "duplicate column names")
  require(dropped.forall(!allNames.contains(_)),
    "a dropped column name cannot also be a live column")

  def dimNames: Seq[String] = dimensions.map(_.name)
  def valueNames: Seq[String] = values.map(_.name)
  def columnNames: Seq[String] = dimNames ++ valueNames

  /** Hive partition column name for dimension i's chunk key. */
  def chunkColName(dim: String): String = s"_ck_$dim"
  def chunkColNames: Seq[String] = dimNames.map(chunkColName)

  def toStructType: StructType = {
    val dimFields = dimensions.zipWithIndex.map { case (d, i) =>
      val b = new MetadataBuilder()
        .putBoolean(MatSchema.DimKey, value = true)
        .putLong(MatSchema.ChunkKey, d.chunkSize)
      // dropped-name tombstones ride on the first dimension field so the
      // whole schema still round-trips through one StructType.json document
      if (i == 0 && dropped.nonEmpty) b.putStringArray(MatSchema.DroppedKey, dropped.toArray)
      val md = b.build()
      StructField(d.name, LongType, nullable = false, md)
    }
    val valFields = values.map(v => StructField(v.name, v.dataType, nullable = true))
    StructType(dimFields ++ valFields)
  }

  def json: String = toStructType.json
}

object MatSchema {
  val DimKey = "graft.dimension"
  val ChunkKey = "graft.chunkSize"

  /** The chunk-key routing function as a Column: EXACT integer
    * `floorDiv(dim, chunkSize)` over the full Long range — provably the
    * same function as the read side's `Math.floorDiv`
    * ([[graft.sources.ChunkFunction.Bound]] for storage-partitioned joins,
    * ChunkPruneRule for predicate-to-chunk mapping).
    *
    * NOT `floor(col / lit(size))`: Long÷Long promotes to double, exact only
    * to 2^53 — beyond that a row would route into a directory the pruner
    * and SPJ key disagree with (wrong-results class). Built from the
    * integral `div` operator (truncates toward zero) with the classic
    * floor correction; all built-ins, so it stays inside whole-stage
    * codegen. `chunkSize > 0` is enforced by [[Dimension]], so the only
    * Long-overflow case of floorDiv (MinValue / -1) cannot arise. */
  def chunkKeyCol(dim: org.apache.spark.sql.Column, chunkSize: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit, when}
    val a = dim.cast(LongType)
    val q = call_function("div", a, lit(chunkSize))
    when((a % chunkSize) =!= 0L && a < 0L, q - 1L).otherwise(q)
  }

  /** Names of value columns DROPPED by ALTER TABLE whose bytes still sit in
    * pre-drop segments (segments are read by column NAME, so re-adding such
    * a name would resurrect the old values — or fail the scan on a type
    * change). Cleared by compaction, which rewrites every live row without
    * them. */
  val DroppedKey = "graft.droppedCols"

  def fromStructType(st: StructType): MatSchema = {
    val (dimFields, valFields) = st.fields.partition(f =>
      f.metadata.contains(DimKey) && f.metadata.getBoolean(DimKey))
    val dropped = dimFields.headOption
      .filter(_.metadata.contains(DroppedKey))
      .map(_.metadata.getStringArray(DroppedKey).toSeq)
      .getOrElse(Nil)
    MatSchema(
      dimFields.toSeq.map(f => Dimension(f.name, f.metadata.getLong(ChunkKey))),
      valFields.toSeq.map(f => ValueCol(f.name, f.dataType)),
      dropped)
  }

  def fromJson(json: String): MatSchema =
    fromStructType(DataType.fromJson(json).asInstanceOf[StructType])
}
