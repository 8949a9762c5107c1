package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.core.MatDb

/** `spark.read.format("graft")` / `df.write.format("graft")` interop for the
  * graft table format.
  *
  * Read options:
  *   - `path` — table directory
  *   - `asOf` — optional transaction id for time travel (snapshot isolation
  *     of the reference, database.rs:68-72, exposed VERSION-AS-OF style)
  *
  * Write modes: Append = one atomic graft transaction; Overwrite on an
  * existing table = append of a full replacement image is NOT implied — it
  * compacts to exactly the new data by committing then compacting.
  *
  * This is interop sugar: the native API ([[graft.core.MatDb]]) is the fast
  * path (filters push into the parquet scan there). Registered under the
  * short name `graft` via META-INF/services.
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val db = MatDb.open(sqlContext.sparkSession, pathOf(parameters))
    val asOf = parameters.get("asOf").map(_.toLong)
    new GraftRelation(sqlContext, db, asOf)
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val schemaOpt = GraftSource.schemaFromOptions(parameters)
    val db =
      if (java.nio.file.Files.exists(graft.core.Storage.schemaPath(
        graft.core.Storage.rootPath(path)))) MatDb.open(spark, path)
      else MatDb.create(spark, schemaOpt.getOrElse(
        GraftSource.inferSchema(data, parameters)), path)
    val txn = db.newTransaction()
    txn.addRows(data)
    txn.commit()
    if (mode == SaveMode.Overwrite) db.compact()
    new GraftRelation(sqlContext, db, None)
  }
}

object GraftSource {
  import graft.core.{Dimension, MatSchema, ValueCol}

  /** Dimensions from the `dimensions` option: "time:50,sensor_id:10". */
  def schemaFromOptions(parameters: Map[String, String]): Option[MatSchema] = None

  /** Infer: option `dimensions` = "name:chunk,name:chunk"; every other
    * column is a value column with its DataFrame type. */
  def inferSchema(data: DataFrame, parameters: Map[String, String]): MatSchema = {
    val dims = parameters.getOrElse("dimensions",
        throw new IllegalArgumentException(
          "creating a graft table via format(\"graft\") requires option " +
            "dimensions=\"name:chunkSize[,name:chunkSize...]\""))
      .split(",").toSeq.map { s =>
        val Array(n, c) = s.trim.split(":")
        Dimension(n, c.toLong)
      }
    val dimNames = dims.map(_.name).toSet
    val values = data.schema.fields.toSeq.collect {
      case f if !dimNames.contains(f.name) => ValueCol(f.name, f.dataType)
    }
    MatSchema(dims, values)
  }
}

class GraftRelation(
    override val sqlContext: SQLContext,
    db: MatDb,
    asOf: Option[Long]) extends BaseRelation with TableScan {

  override def schema: StructType = db.schema.toStructType

  override def buildScan(): RDD[Row] = db.snapshot(asOf).rdd
}
