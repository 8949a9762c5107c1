package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus a feature-extraction pipeline whose Spark-side plumbing
  * (schema, partitioning, batch shape) is real. IMAGE decode is REAL —
  * `javax.imageio` ships in the JDK (PNG/JPEG/BMP/GIF/WBMP) — AUDIO
  * decode is REAL — `javax.sound.sampled` ships in the JDK (WAV/AIFF/AU
  * PCM) — and VIDEO demux is REAL for MJPEG-in-AVI — AVI is a plain RIFF
  * chunk container ([[demuxAvi]]) and each MJPEG frame chunk is a complete
  * JPEG that [[decodeImage]] decodes — so no new dependency for any of the
  * three; a deterministic stub remains as the fallback for payloads no
  * reader accepts and for the codecs the JDK lacks (H.264-class inter-frame
  * video needs an external decoder and stays a clearly-marked STUB).
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

  /** REAL image decode through the JDK's ImageIO registry. None when no
    * installed reader recognizes the payload OR a reader claims the format
    * and then fails mid-decode (truncated body, unsupported variant like
    * CMYK JPEG — ImageIO throws IIOException there rather than returning
    * null) — callers fall back to [[decodeStub]] in both cases, keeping
    * the pipeline total: one corrupt file must not fail a 100 TB job.
    * ImageIO's static registry is thread-safe; per-partition init is not
    * needed for the JDK readers (a native codec would hook in at the
    * mapPartitions seam instead). */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Deterministic 8-float feature vector from REAL pixel data: per-channel
    * RGB means and standard deviations (population), mean luminance
    * (Rec.601), and a log2 aspect ratio — all scaled to small ranges so the
    * vector composes with the cosine/LSH operators. Integer pixel sums, so
    * the result is bit-stable across runs and partitionings. */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sr, sg, sb = 0L      // channel sums
    var qr, qg, qb = 0L      // channel square sums
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b
        qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
        x += 1
      }
      y += 1
    }
    def mean(s: Long) = s.toDouble / n
    def std(q: Long, s: Long) = math.sqrt(math.max(0.0, q.toDouble / n - mean(s) * mean(s)))
    val lum = (0.299 * mean(sr) + 0.587 * mean(sg) + 0.114 * mean(sb)) / 255.0
    Array(
      (mean(sr) / 255.0).toFloat, (mean(sg) / 255.0).toFloat, (mean(sb) / 255.0).toFloat,
      (std(qr, sr) / 255.0).toFloat, (std(qg, sg) / 255.0).toFloat, (std(qb, sb) / 255.0).toFloat,
      lum.toFloat,
      (math.log(w.toDouble / h) / math.log(2.0)).toFloat)
  }

  /** 63-bit perceptual hash (pHash) of REAL pixel data — the image
    * near-dup signature (same family as the classic DCT pHash: 32×32
    * grayscale → 2D DCT-II → the 8×8 low-frequency block minus DC →
    * median threshold). Two images that re-encode, resize, or lightly
    * edit the same content land within a small Hamming distance; pair
    * them with [[graft.operators.SimHashBands.hammingPairsW]] under
    * `Split63` — never all-pairs. Deterministic: nearest-pixel sampling,
    * integer luminance weights, StrictMath cosines (bit-specified fdlibm,
    * immune to platform libm drift), fixed summation order. */
  def phash64(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val g = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) {
        val p = img.getRGB(x * img.getWidth / N, y * img.getHeight / N)
        g(y)(x) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)).toDouble / 1000.0
        x += 1
      }
      y += 1
    }
    val cosT = Array.tabulate(8, N)((k, n) =>
      StrictMath.cos((2 * n + 1) * k * StrictMath.PI / (2.0 * N)))
    // separable DCT-II, rows then columns, only the 8×8 block we keep
    val tmp = Array.ofDim[Double](N, 8)
    var r = 0
    while (r < N) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < N) { s += g(r)(x) * cosT(u)(x); x += 1 }
        tmp(r)(u) = s; u += 1
      }
      r += 1
    }
    val dct = Array.ofDim[Double](8, 8)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < N) { s += tmp(yy)(u) * cosT(v)(yy); yy += 1 }
        dct(v)(u) = s; u += 1
      }
      v += 1
    }
    val coefs = (for (vv <- 0 until 8; uu <- 0 until 8 if vv != 0 || uu != 0)
      yield dct(vv)(uu)).toArray
    val median = { val s = coefs.sorted; s(31) } // 63 coefficients
    var h = 0L; var bit = 0
    for (vv <- 0 until 8; uu <- 0 until 8 if vv != 0 || uu != 0) {
      if (dct(vv)(uu) > median) h |= 1L << bit
      bit += 1
    }
    h
  }

  /** Deterministic 64×64 PNG rendered from text bytes — the battery's
    * stand-in for a real image corpus (no image files ship with the test
    * data): pixels cycle the UTF-8 bytes through the RGB channels, so
    * byte-identical texts render byte-identical images and the real
    * ImageIO encode→decode→[[phash64]] path gets exercised end to end. */
  def renderDocImage(text: String): Array[Byte] = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64 * 64) {
      def b(k: Int) = if (bytes.isEmpty) 0 else bytes((i * 3 + k) % bytes.length) & 0xff
      img.setRGB(i % 64, i / 64, (b(0) << 16) | (b(1) << 8) | b(2))
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Brightness-shift a decodable image by `delta` per channel (clamped)
    * and re-encode as PNG — a deterministic light-edit generator for
    * perceptual-hash tests and demos; undecodable payloads pass through. */
  def brightenPng(bytes: Array[Byte], delta: Int): Array[Byte] =
    decodeImage(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          def c(shift: Int) =
            math.min(255, math.max(0, ((p >> shift) & 0xff) + delta))
          out.setRGB(x, y, (c(16) << 16) | (c(8) << 8) | c(0))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }.getOrElse(bytes)

  /** REAL audio decode through the JDK's sampled-audio registry (WAV, AIFF,
    * AU). Any decodable payload is first converted to interleaved 16-bit
    * PCM_SIGNED little-endian at its native rate and channel count, so
    * features are storage-format-independent (the same waveform as 8-bit
    * unsigned WAV or big-endian AIFF decodes to identical samples up to
    * quantization). Returns (sampleRate, channels, samples) — None when no
    * installed reader recognizes the payload or one fails mid-decode, same
    * totality contract as [[decodeImage]]: one corrupt file must not fail
    * a 100 TB job. */
  def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, /* bigEndian = */ false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val raw = pcm.readAllBytes()
          val n = raw.length / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some((src.getSampleRate, src.getChannels, samples))
        } finally pcm.close()
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException | _: RuntimeException => None
    }

  /** Deterministic 8-float feature vector from REAL PCM samples: RMS level,
    * peak level, zero-crossing rate, DC offset (all normalized to full
    * scale), log2 duration in seconds, sample rate and channel count scaled
    * small, and log2 sample count — the audio analogue of [[imageFeatures]],
    * same small ranges so the vector composes with the cosine/LSH
    * operators. Integer sample sums, so the result is bit-stable across
    * runs and partitionings. Zero-crossing counts sign flips over the
    * interleaved stream (exact per-channel for mono, a cross-channel
    * activity proxy otherwise). */
  def audioFeatures(sampleRate: Float, channels: Int, samples: Array[Short]): Array[Float] = {
    val n = math.max(samples.length, 1)
    var s, q, peak, zc = 0L
    var prevSign = 0
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      s += v; q += v * v
      val a = math.abs(v); if (a > peak) peak = a
      val sign = java.lang.Long.signum(v)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      }
      i += 1
    }
    val full = 32768.0
    val durationSec = samples.length.toDouble / channels / sampleRate
    Array(
      (math.sqrt(q.toDouble / n) / full).toFloat,
      (peak / full).toFloat,
      (zc.toDouble / n).toFloat,
      (s.toDouble / n / full).toFloat,
      (math.log(math.max(durationSec, 1e-9)) / math.log(2.0)).toFloat,
      sampleRate / 48000f,
      channels / 8f,
      (math.log(n.toDouble) / math.log(2.0)).toFloat)
  }

  /** REAL video demux for the one container+codec combination the JDK can
    * handle end to end: MJPEG-in-AVI. AVI is a RIFF container — plain
    * fourcc/size chunk walking, no codec involved — and every `##dc`/`##db`
    * stream-data chunk of an MJPEG stream is a complete JPEG image that
    * [[decodeImage]] already decodes. Frame timestamps derive from the main
    * `avih` header's micro-seconds-per-frame (40 ms/frame assumed when the
    * header is absent). Returns the ordered `(frame_idx, ts_ms, payload)`
    * frames; None when the payload is not RIFF/AVI, the structure is
    * malformed/truncated, or no video stream chunks exist — callers fall
    * back to [[demuxStub]], the same totality contract as the decoders. */
  def demuxAvi(bytes: Array[Byte]): Option[Vector[(Int, Long, Array[Byte])]] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      var usPerFrame = 0L
      val frames = Vector.newBuilder[Array[Byte]]
      // walk [from, until) as a chunk sequence; LIST chunks recurse with
      // their type, so movi frame chunks are recognized wherever nested
      def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = fourcc(off)
          val size = u32(off + 4)
          val dataStart = off + 8
          if (size > until - dataStart)
            throw new IllegalArgumentException("truncated chunk")
          val dataEnd = dataStart + size.toInt
          if (id == "LIST" && size >= 4)
            walk(dataStart + 4, dataEnd, inMovi = fourcc(dataStart) == "movi")
          else if (id == "avih" && size >= 4)
            usPerFrame = u32(dataStart)
          else if (inMovi && id(0).isDigit && id(1).isDigit &&
                   id(2) == 'd' && (id(3) == 'c' || id(3) == 'b'))
            frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          off = dataEnd + (size.toInt & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, math.min(bytes.length.toLong, 8L + u32(4)).toInt, inMovi = false)
      val fs = frames.result()
      if (fs.isEmpty) None
      else {
        val us = if (usPerFrame > 0) usPerFrame else 40000L
        Some(fs.zipWithIndex.map { case (f, i) => (i, i * us / 1000, f) })
      }
    } catch { case _: RuntimeException => None }
  }

  /** Demux one media payload: real RIFF walking for AVI payloads, stub for
    * everything else — the seam [[sampleFrames]] runs per partition. */
  def demux(bytes: Array[Byte]): Iterator[(Int, Long, Array[Byte])] =
    demuxAvi(bytes).map(_.iterator).getOrElse(demuxStub(bytes))

  /** STUB decoder: stands in for the codecs the JDK lacks (inter-frame video).
    * Deterministic fake dimensions/features derived from the bytes
    * so tests are exact. A real deployment swaps only this function
    * (e.g. ffmpeg via JNI). */
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

  /** Decode one media payload: real ImageIO for decodable `image` rows,
    * real sampled-audio for decodable `audio` rows (the typed metadata pair
    * is (sampleRate Hz, channels) there — the audio shape of the image
    * (width, height)), real MJPEG-AVI demux + first-keyframe decode for
    * decodable `video` rows (dimensions and pixel features of the first
    * decodable frame — per-frame features come from [[sampleFrames]] +
    * the image path), stub for unrecognized payloads. */
  def decode(kind: String, bytes: Array[Byte]): (Int, Int, Array[Float]) =
    if (kind == "image")
      decodeImage(bytes)
        .map(img => (img.getWidth, img.getHeight, imageFeatures(img)))
        .getOrElse(decodeStub(kind, bytes))
    else if (kind == "audio")
      decodeAudio(bytes)
        .map { case (rate, ch, samples) =>
          (math.round(rate), ch, audioFeatures(rate, ch, samples)) }
        .getOrElse(decodeStub(kind, bytes))
    else if (kind == "video")
      demuxAvi(bytes)
        .flatMap(_.iterator.flatMap { case (_, _, f) => decodeImage(f) }
          .nextOption())
        .map(img => (img.getWidth, img.getHeight, imageFeatures(img)))
        .getOrElse(decodeStub(kind, bytes))
    else decodeStub(kind, bytes)

  /** Per-partition decode + feature extraction. One decoder instance per
    * partition (where a native codec would be initialized once per task). */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights…)
      rows.map { r =>
        val (w, h, f) = decode(r.kind, r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length, w, h, f)
      }
    }
  }

  /** REAL pixel resample: clamp the longer side to `maxDim` with bilinear
    * interpolation and re-encode as PNG; rows whose payload no reader
    * accepts (and small-enough images) pass through untouched. Runs before
    * [[extractFeatures]] when features should describe the thumbnail, after
    * when they should describe the original ([[resize]] covers the
    * metadata-only contract at that point). */
  def resizeMedia(ds: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    require(maxDim > 0, "maxDim must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.media) match {
          case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
            val long = math.max(img.getWidth, img.getHeight)
            val w = math.max(1, img.getWidth * maxDim / long)
            val h = math.max(1, img.getHeight * maxDim / long)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(media = bos.toByteArray)
          case _ => r
        }
      }
    }
  }

  /** One sampled video frame: the UDTF-shaped output of [[sampleFrames]]. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** STUB frame demuxer — the [[demux]] fallback for the containers/codecs
    * the JDK lacks (MP4, H.264-class inter-frame video): derives a
    * deterministic frame count and per-frame payload from the bytes (a
    * real deployment swaps in ffmpeg/jcodec and keeps the iterator
    * shape). */
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

  /** (doc_id, frame_idx, phash): the video near-dup signature table —
    * REAL demux → per-frame JPEG decode → [[phash64]], one
    * partition-parallel pass over the media scan (frames never shuffle;
    * only the 24-byte signature rows do). Undecodable frames (stub demux
    * payloads, corrupt chunks) are dropped: no pixels, no signature. */
  def framePhashes(ds: Dataset[MediaRow], stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    sampleFrames(ds, stride)
      .mapPartitions(_.flatMap { f =>
        decodeImage(f.frame).map(img => (f.doc_id, f.frame_idx, phash64(img)))
      })
      .toDF("doc_id", "frame_idx", "phash")
  }

  /** (doc_id, frame_idx, phash) for a MIXED media stream: images
    * contribute one signature at frame_idx 0 (direct decode → [[phash64]]),
    * videos one per `stride`-sampled decodable frame (demux → per-frame
    * decode), other kinds none. One partition-parallel pass — the
    * incremental-ingest twin of [[framePhashes]], so a streaming batch of
    * heterogeneous media needs a single signature extraction. */
  def mediaPhashes(ds: Dataset[MediaRow], stride: Int = 1): DataFrame = {
    require(stride > 0, "stride must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      r.kind match {
        case "image" =>
          decodeImage(r.media).map(img => (r.doc_id, 0, phash64(img))).iterator
        case "video" =>
          demux(r.media).filter(_._1 % stride == 0).flatMap { case (idx, _, fr) =>
            decodeImage(fr).map(img => (r.doc_id, idx, phash64(img)))
          }
        case _ => Iterator.empty
      }
    }).toDF("doc_id", "frame_idx", "phash")
  }

  /** Video near-dup pairs: two videos pair when at least `minFrames` of
    * their sampled frames match within Hamming≤2 — the frame signatures
    * go through the exact 3×21-bit pigeonhole banding
    * ([[graft.operators.SimHashBands.Split63]]), so candidates are banded
    * equi-join matches, never all-pairs over frames. Frame keys pack
    * (doc_id, frame_idx) into one long (doc_id < 2^43, frame_idx < 2^20);
    * packing is doc-major, so the banding's `a < b` order never splits a
    * video pair across orientations. Output: (video_a, video_b,
    * n_matched_frames), video_a < video_b; n_matched_frames counts
    * DISTINCT matched frames of video_a — a single frame of A matching
    * several near-identical frames of B (a freeze-frame, a title card)
    * counts once, so `minFrames` means what it says. */
  def videoNearDupPairs(frames: DataFrame, minFrames: Int = 1): DataFrame = {
    val sigs = frames.select(
      (col("doc_id") * lit(1048576L) + col("frame_idx")).as("fid"),
      col("phash").as("simhash"))
    graft.operators.SimHashBands
      .hammingPairsW(sigs, "fid", maxDist = 2, graft.operators.SimHashBands.Split63)
      .select(expr("doc_a div 1048576").as("video_a"),
        expr("doc_b div 1048576").as("video_b"), col("doc_a").as("fid_a"))
      .where(col("video_a") =!= col("video_b"))
      .groupBy(col("video_a"), col("video_b"))
      .agg(countDistinct(col("fid_a")).as("n_matched_frames"))
      .where(col("n_matched_frames") >= minFrames)
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
        demux(r.media).filter(_._1 % stride == 0)
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
