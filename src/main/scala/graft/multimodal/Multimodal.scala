package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus a feature-extraction pipeline whose Spark-side plumbing
  * (schema, partitioning, batch shape) is real while the codec itself is a
  * clearly-marked deterministic STUB — the actual image/audio libraries are
  * not in this container.
  *
  * The batch shape mirrors what a vectorized (Arrow/pandas-UDF-style) decode
  * would need: `mapPartitions` hands each task an iterator over its whole
  * partition, so a real decoder could amortize model/codec init per
  * partition, exactly like `mapInPandas` batches do in PySpark.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder: stands in for an image/audio codec. Deterministic fake
    * dimensions/features derived from the bytes so tests are exact. A real
    * deployment swaps only this function (e.g. javax.imageio / ffmpeg). */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L // deterministic poly-hash of the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    val width = 16 + math.floorMod(h, 1024).toInt
    val height = 16 + math.floorMod(h >> 10, 1024).toInt
    val features = Array.tabulate(8)(j =>
      (math.floorMod(h >> (j * 7), 997).toFloat / 997f) - 0.5f)
    (width, height, features)
  }

  /** Per-partition decode + feature extraction. One decoder instance per
    * partition (where a real codec would be initialized once per task). */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights…)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.kind, r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length, w, h, f)
      }
    }
  }

  /** Build a media table from the documents table (text bytes standing in
    * for encoded media), partitioned for balanced decode tasks: binary
    * payloads are size-skewed in real corpora, so repartition by a hash of
    * the id — never by kind, which is low-cardinality and skews. */
  def mediaFromDocuments(docs: DataFrame, partitions: Int): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      (when(col("doc_id") % 2 === 0, "image").otherwise("audio")).as("kind"),
      encode(col("text"), "utf-8").as("media"))
      .repartition(partitions, col("doc_id"))
      .as[MediaRow]
  }
}
