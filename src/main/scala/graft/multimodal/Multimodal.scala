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

  /** One sampled video frame: the UDTF-shaped output of [[sampleFrames]]. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** STUB frame demuxer: derives a deterministic frame count and per-frame
    * payload from the bytes (a real deployment swaps in ffmpeg/jcodec and
    * keeps the iterator shape). */
  def demuxStub(bytes: Array[Byte]): Iterator[(Int, Long, Array[Byte])] = {
    val nFrames = 8 + (bytes.length % 25) // "video length" from the payload
    // ONE pass over the payload; per-frame hashes derive from it in O(1)
    // (h_i = base*31^len + i*31^len ≡ base + i*p31 — same values as
    // folding (seed+i) through the payload, without rescanning it per frame)
    var base = 1125899906842597L
    var p31 = 1L
    var j = 0
    while (j < bytes.length) { base = 31 * base + (bytes(j) & 0xff); p31 *= 31; j += 1 }
    (0 until nFrames).iterator.map { i =>
      val h = base + i * p31
      val frame = Array.tabulate[Byte](16)(k => ((h >> ((k % 8) * 8)) & 0xff).toByte)
      (i, i * 40L /* 25 fps */, frame)
    }
  }

  /** Frame sampling: every `stride`-th frame of each media row — the typed
    * flatMap (UDTF) shape: one input row fans out to N frame rows, work
    * stays fully partition-parallel, and a real demuxer initializes once
    * per partition exactly like the decode path. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    require(stride > 0, "stride must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init would go here (demuxer handles, hw decoder…)
      rows.flatMap { r =>
        demuxStub(r.media).filter(_._1 % stride == 0)
          .map { case (idx, ts, frame) => FrameRow(r.doc_id, idx, ts, frame) }
      }
    }
  }

  /** Resize: clamp the longer side to `maxDim`, preserving aspect ratio —
    * a pure per-row map over the decoded dimensions (the pixel resample
    * itself lives behind the same stub boundary as the codec). Features
    * are unchanged: extraction happens on the decoded image, not the
    * thumbnail. */
  def resize(ds: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    require(maxDim > 0, "maxDim must be positive")
    import ds.sparkSession.implicits._
    ds.map { r =>
      val longSide = math.max(r.width, r.height)
      if (longSide <= maxDim) r
      else {
        // integer rescale, floor, min 1 px — deterministic in one pass
        val w = math.max(1, r.width * maxDim / longSide)
        val h = math.max(1, r.height * maxDim / longSide)
        r.copy(width = w, height = h)
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
