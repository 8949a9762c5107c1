package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.ingest.Ingest
import graft.functions.{Fingerprint64, Scored, TopKAggregator}
import graft.multimodal.Multimodal

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeTsv(dir: java.nio.file.Path, name: String, lines: Seq[String], gzip: Boolean): Unit = {
    val f = dir.resolve(name)
    if (gzip) {
      val out = new GZIPOutputStream(Files.newOutputStream(f))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    } else Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
  }

  test("tsv + gz + glob ingest with timestamp parse, fixed point, corrupt lines") {
    val dir = Files.createTempDirectory("graft-ingest")
    val good = Seq(
      "31/12/1995 11:59:59 p.m.\tpump\ttemp\tC\t12.345",
      "1/1/1996 12:00:01 a.m.\tpump\ttemp\tC\t-3.2",
      "2/1/1996 6:30:00 a.m.\tfan\trpm\tr\t850.5")
    val bad = Seq("not a timestamp\tx\ty\tz\tnope")
    writeTsv(dir, "a.tsv", good.take(2) ++ bad, gzip = false)
    writeTsv(dir, "b.tsv.gz", good.drop(2), gzip = true)

    val raw = Ingest.readSensorLog(spark, s"$dir/*.tsv*")
    val parsed = Ingest.parseSensorLog(raw)
    val rows = parsed.orderBy("time").collect()
    assert(rows.length === 3) // bad line dropped, not fatal
    assert(rows(0).getAs[Long]("value") === 12345L) // x1000 fixed point
    assert(rows(1).getAs[Long]("value") === -3200L)
    assert(rows(2).getAs[Long]("value") === 850500L)
    // 11:59:59 p.m. on 31/12/1995 UTC
    assert(rows(0).getAs[Long]("time") === 820454399000L)
  }

  test("dictionary get-or-create assigns stable ids and encodes via broadcast join") {
    import spark.implicits._
    val existing = Seq(("pump", "temp", 1L), ("fan", "rpm", 2L))
      .toDF("component", "sensor", "id")
    val rows = Seq(("pump", "temp", 10.0), ("valve", "flow", 5.0), ("valve", "flow", 6.0))
      .toDF("component", "sensor", "v")
    val dict = Ingest.dictionaryGetOrCreate(existing, rows, Seq("component", "sensor"))
    val byKey = dict.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey(("pump", "temp")) === 1L) // existing ids untouched
    assert(byKey(("valve", "flow")) === 3L) // max + rank
    val encoded = Ingest.encodeWithDictionary(rows, dict, Seq("component", "sensor"))
    assert(encoded.where(col("id").isNull).count() === 0)
  }

  test("dense id assignment matches dense_rank and never funnels to one partition") {
    import spark.implicits._
    val keys = (1 to 500).map(i => f"key_$i%04d").toDF("k").repartition(8)
    val ids = Ingest.denseRankIds(keys, Seq("k"), "id")
    val got = ids.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._2).toSeq === (1L to 500L)) // dense, 1..N, in key order
    assert(got.map(_._1).toSeq === (1 to 500).map(i => f"key_$i%04d"))
    // the scale guarantee: no single-partition exchange anywhere in the plan
    // (the old dense_rank-over-empty-partitionBy window had exactly that)
    val plan = ids.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fingerprint64 matches reference FNV-1a and is codegen'd") {
    import spark.implicits._
    Fingerprint64.register(spark)
    val df = Seq("", "a", "hello world").toDF("s")
      .selectExpr("s", "fingerprint64(s) AS fp")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent scalar reference implementation
    def fnv(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xffL)) * 0x100000001b3L)
    assert(got("") === fnv(""))
    assert(got("a") === fnv("a"))
    assert(got("hello world") === fnv("hello world"))
    // over a file source (local Seqs collapse to LocalTableScan and prove
    // nothing): the expression must stay inside the WholeStageCodegen span
    val fileDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "fingerprint64(text) AS fp")
      .where("fp IS NOT NULL")
    assert(fileDf.count() > 0)
    // "*(n)" prefixes mark WholeStageCodegen stages; the Project computing
    // fingerprint64 must carry one (an interpreted fallback would drop it)
    val plan = fileDf.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("fingerprint64")), plan)
  }

  test("vec_dot/vec_sqdist match the HOF fold bit-for-bit and stay codegen'd") {
    import graft.functions.VectorOps
    VectorOps.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
    val paired = emb.as("a").join(emb.as("b"), expr("a.vec_id = b.vec_id - 1"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    // the interpreted higher-order formulation these kernels replaced —
    // identical left fold, so equality must be EXACT, not approximate
    val hofDot = expr("aggregate(zip_with(x, y, (p, q) -> p * q), cast(0.0 as double), (acc, t) -> acc + t)")
    val hofSq = expr("aggregate(zip_with(x, y, (p, q) -> (p - q) * (p - q)), cast(0.0 as double), (acc, t) -> acc + t)")
    val cmp = paired.select(
      VectorOps.dotCol(col("x"), col("y")).as("d1"), hofDot.as("d2"),
      VectorOps.sqDistCol(col("x"), col("y")).as("s1"), hofSq.as("s2"))
    assert(cmp.where(col("d1") =!= col("d2") || col("s1") =!= col("s2")).count() === 0)
    assert(cmp.count() > 0)
    // and the kernel runs inside a WholeStageCodegen span (inspect the
    // FINAL adaptive plan — pre-execution AQE plans carry no codegen marks)
    val df = paired.select(VectorOps.dotCol(col("x"), col("y")).as("d"))
      .where(col("d").isNotNull)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_dot")), plan)
  }

  test("topk aggregator keeps k best per group with deterministic ties") {
    import spark.implicits._
    val topk = new TopKAggregator(2).toColumn
    val ds = Seq(
      (1L, Scored(10, 0.5)), (1L, Scored(11, 0.9)), (1L, Scored(12, 0.7)),
      (2L, Scored(20, 0.1))).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(topk.name("top"))
      .collect().toMap
    assert(out(1L).map(_.id) === Seq(11L, 12L))
    assert(out(2L).map(_.id) === Seq(20L))
  }

  test("topk_scored TypedImperativeAggregate matches the window form exactly") {
    import graft.functions.TopKScored
    TopKScored.register(spark)
    // real data, ties included (equal n_chars within a source): per-source
    // top 5 docs by (score desc, id asc)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars").cast("double").as("score"))
    val agg = docs.groupBy(col("source"))
      .agg(TopKScored.topkCol(col("doc_id"), col("score"), 5).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).as("rn"), col("col.id").as("doc_id"),
        col("col.score").as("score"))
    val win = docs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .where(col("rn") <= 5)
      .select(col("source"), col("rn"), col("doc_id"), col("score"))
    assert(agg.count() > 0)
    assert(agg.exceptAll(win).count() === 0 && win.exceptAll(agg).count() === 0)
    // partial aggregation: the plan is ObjectHashAggregate (not a window
    // sort), i.e. the shuffle carries O(k) per group
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // NaN ranks above +Infinity and -0.0 equals 0.0, exactly as the window
    // form sorts doubles — a raw >/== buffer comparison would let one NaN
    // lock the buffer shut
    import spark.implicits._
    val weird = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, Double.PositiveInfinity), (1L, 12L, 1.0),
      (1L, 13L, Double.NaN), (2L, 20L, -0.0), (2L, 21L, 0.0), (2L, 22L, -1.0))
      .toDF("g", "doc_id", "score")
    val wAgg = weird.groupBy(col("g"))
      .agg(TopKScored.topkCol(col("doc_id"), col("score"), 2).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rn"), col("col.id").as("doc_id"))
    val wWin = weird.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .where(col("rn") <= 2).select(col("g"), col("rn"), col("doc_id"))
    assert(wAgg.exceptAll(wWin).count() === 0 && wWin.exceptAll(wAgg).count() === 0)

    // SQL surface works too, and k must be a literal
    docs.createOrReplaceTempView("tks_docs")
    val viaSql = spark.sql(
      "SELECT source, topk_scored(doc_id, score, 5) top FROM tks_docs GROUP BY source")
    assert(viaSql.count() === docs.select(col("source")).distinct().count())
    intercept[Exception] {
      spark.sql("SELECT topk_scored(doc_id, score, doc_id) FROM tks_docs").collect()
    }
  }
}

class MultimodalSpec extends AnyFunSuite {
  import MediaFixtures.{muxAvi, jpegFrameF, jpegFrame}
  private lazy val spark = TestSpark.spark

  test("binary media pipeline: schema, partitioning, deterministic stub decode") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs, partitions = 4)
    assert(media.rdd.getNumPartitions === 4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("doc_id", "kind", "n_bytes", "width", "height", "features"))
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    // deterministic: same input -> same features both runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => r.doc_id -> r.features.toSeq).toMap
    assert(rows.forall(r => again(r.doc_id) == r.features.toSeq))
    // n_bytes matches the utf-8 payload length
    val nc = docs.select(col("doc_id"), length(encode(col("text"), "utf-8")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => nc(r.doc_id) == r.n_bytes))
  }

  test("REAL image decode: generated PNGs through repartition → resize → decode → features") {
    import Multimodal.MediaRow
    import spark.implicits._
    // deterministic PNG fixtures: solid + gradient + non-square, plus one
    // garbage payload that must fall back to the stub (pipeline stays total)
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val solidRed = png(100, 60, (_, _) => 0xff0000)
    val gradient = png(128, 128, (x, _) => (x * 2) << 16 | (x * 2) << 8 | (x * 2))
    val tall = png(40, 200, (_, y) => if (y % 2 == 0) 0xffffff else 0x000000)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val media = Seq(
      MediaRow(1L, "image", solidRed), MediaRow(2L, "image", gradient),
      MediaRow(3L, "image", tall), MediaRow(4L, "image", garbage)
    ).toDS().repartition(3)

    // decode without resize: REAL dimensions and pixel statistics
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.doc_id -> r).toMap
    assert((feats(1L).width, feats(1L).height) === (100, 60))
    assert((feats(2L).width, feats(2L).height) === (128, 128))
    assert((feats(3L).width, feats(3L).height) === (40, 200))
    // solid red: meanR=1, meanG=meanB=0, zero stds, Rec.601 luminance 0.299
    assert(math.abs(feats(1L).features(0) - 1.0f) < 1e-6)
    assert(feats(1L).features(1) === 0.0f && feats(1L).features(2) === 0.0f)
    assert(feats(1L).features.slice(3, 6).forall(_ == 0.0f))
    assert(math.abs(feats(1L).features(6) - 0.299f) < 1e-3)
    // features equal the same functions applied driver-side (bit-stable)
    val expected2 = Multimodal.imageFeatures(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gradient)))
    assert(feats(2L).features.toSeq === expected2.toSeq)
    // aspect feature: log2(40/200) < 0 for the tall image
    assert(feats(3L).features(7) < 0f)
    // garbage payload fell back to the deterministic stub
    val (sw, sh, sf) = Multimodal.decodeStub("image", garbage)
    assert((feats(4L).width, feats(4L).height, feats(4L).features.toSeq) ===
      (sw, sh, sf.toSeq))
    // a TRUNCATED payload with a valid PNG signature makes ImageIO's reader
    // claim the format and then throw mid-decode — that must ALSO fall back
    // to the stub (pipeline totality), not fail the task
    val truncated = solidRed.take(solidRed.length / 3)
    assert(Multimodal.decodeImage(truncated).isEmpty)
    val tf = Multimodal.extractFeatures(
      Seq(MediaRow(9L, "image", truncated)).toDS()).collect().head
    val (tw, th, tfs) = Multimodal.decodeStub("image", truncated)
    assert((tf.width, tf.height, tf.features.toSeq) === (tw, th, tfs.toSeq))
    // ...and resizeMedia passes it through untouched instead of crashing
    assert(Multimodal.resizeMedia(Seq(MediaRow(9L, "image", truncated)).toDS(), 32)
      .collect().head.media.length === truncated.length)

    // REAL pixel resample: longer side clamped, aspect preserved, and the
    // re-encoded PNG decodes to the new dimensions with sane statistics
    val resized = Multimodal.extractFeatures(Multimodal.resizeMedia(media, maxDim = 64))
      .collect().map(r => r.doc_id -> r).toMap
    assert((resized(1L).width, resized(1L).height) === (64, 38))   // 100x60
    assert((resized(2L).width, resized(2L).height) === (64, 64))   // 128x128
    assert((resized(3L).width, resized(3L).height) === (12, 64))   // 40x200
    // solid color survives resampling exactly
    assert(math.abs(resized(1L).features(0) - 1.0f) < 1e-6)
    assert(resized(1L).features(1) === 0.0f)
    // gradient mean is resample-invariant to ~1 gray level
    assert(math.abs(resized(2L).features(0) - feats(2L).features(0)) < 1f / 255f)
    // garbage passes through resizeMedia untouched
    assert(resized(4L).n_bytes === garbage.length)
  }

  test("pHash: deterministic, re-encode/resize invariant, distinct images far") {
    import spark.implicits._
    def img(w: Int, h: Int, rgb: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      im
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // smooth low-frequency content (cosine mixes — the image class the
    // JPEG/resize separation holds for; a pixel-noise checkerboard is
    // aliasing-dominated at the 32×32 downsample and NOT stable)
    def lumImg(f: (Int, Int) => Double) = img(128, 96, (x, y) => {
      val c = math.max(0, math.min(255, f(x, y).toInt)); (c << 16) | (c << 8) | c
    })
    val a = lumImg((x, y) => 128 + 50 * math.cos(2 * math.Pi * x * 2 / 128.0) +
      40 * math.cos(2 * math.Pi * y * 3 / 96.0) +
      30 * math.cos(2 * math.Pi * (x + y) * 1.5 / 128.0))
    val b = lumImg((x, y) => 128 + 55 * math.sin(2 * math.Pi * x / 128.0 + 1.0) -
      45 * math.cos(2 * math.Pi * y * 2 / 96.0) +
      25 * math.sin(2 * math.Pi * (x - y) * 2.5 / 128.0))
    val ha = Multimodal.phash64(a)
    // 63-bit contract: bit 63 never set, exactly <32 bits above the median
    assert(ha >= 0L)
    assert(Multimodal.phash64(a) === ha) // deterministic
    // PNG encode → decode round trip is lossless: identical hash
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(a, "png", bos)
    val back = Multimodal.decodeImage(bos.toByteArray).get
    assert(Multimodal.phash64(back) === ha)
    // perceptual separation: light edits (lossy JPEG re-encode, bilinear
    // downscale) move the hash FAR LESS than distinct content (~31.5 bits
    // expected for independent hashes). Median thresholding flips
    // near-zero coefficients under noise, so edits aren't distance-0 —
    // the margin between edit-distance and distinct-distance is the
    // property that makes thresholded pairing meaningful.
    val jos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(a, "jpg", jos)
    val jpg = Multimodal.decodeImage(jos.toByteArray).get
    val dJpg = dist(Multimodal.phash64(jpg), ha)
    assert(dJpg <= 14, s"JPEG re-encode moved pHash by $dJpg bits")
    // bilinear downscale stays perceptually near
    val small = Multimodal.decodeImage(
      Multimodal.resizeMedia(
        Seq(Multimodal.MediaRow(1L, "image", bos.toByteArray)).toDS(), maxDim = 64)
        .collect().head.media).get
    val dSmall = dist(Multimodal.phash64(small), ha)
    assert(dSmall <= 10, s"downscale moved pHash by $dSmall bits")
    // genuinely different content is far — well above both edit distances
    val dOther = dist(Multimodal.phash64(b), ha)
    assert(dOther >= 24, s"distinct images only $dOther bits apart")
    assert(dOther > dJpg + 8 && dOther > dSmall + 8, "no edit/distinct margin")
    // the rendered-document path: identical text → identical hash,
    // decodable by the REAL ImageIO reader
    val p1 = Multimodal.renderDocImage("the quick brown fox")
    val p2 = Multimodal.renderDocImage("the quick brown fox")
    assert(p1.toSeq === p2.toSeq)
    assert(Multimodal.decodeImage(p1).isDefined)
    // the q93-critical invariance is EXACT: a brightness shift on content
    // that never clamps (ASCII bytes ≤ 0x7e + 16 < 255) adds a constant to
    // every luminance sample, which moves ONLY the excluded DC coefficient
    // — the 63 kept coefficients and their median are untouched
    val hBase = Multimodal.phash64(Multimodal.decodeImage(p1).get)
    val hBright = Multimodal.phash64(
      Multimodal.decodeImage(Multimodal.brightenPng(p1, 16)).get)
    assert(hBright === hBase, "brightness shift must not move pHash")
  }

  test("video near-dup: shared frames pair via banded frame pHash, real demux") {
    import spark.implicits._
    import Multimodal.MediaRow
    // structured frames (cosine mixes — pHash-stable content); seeds give
    // pairwise-distant signatures, shared frames are byte-identical JPEGs
    def frame(seed: Int) = jpegFrameF(64, 48, (x, y) => {
      val l = 128 + 60 * math.cos(2 * math.Pi * (x * (1 + seed % 3) +
        y * (1 + seed / 3)) / 48.0) + 40 * math.sin(2 * math.Pi * y * (1 + seed % 4) / 32.0)
      val c = math.max(0, math.min(255, l.toInt)); (c << 16) | (c << 8) | c
    })
    val shared = Seq(frame(0), frame(7), frame(13))
    val aOnly = Seq(frame(21), frame(34))
    val bOnly = Seq(frame(45), frame(56))
    val cOnly = (60 to 64).map(frame)
    val videoA = muxAvi(shared ++ aOnly, 40000, 64, 48)
    val videoB = muxAvi(bOnly ++ shared, 40000, 64, 48) // shared at other offsets
    val videoC = muxAvi(cOnly, 40000, 64, 48)
    val media = Seq(MediaRow(1L, "video", videoA), MediaRow(2L, "video", videoB),
      MediaRow(3L, "video", videoC)).toDS().repartition(3)
    val sigs = Multimodal.framePhashes(media, stride = 1)
    assert(sigs.count() === 15) // every frame decodes; none dropped
    val pairs = Multimodal.videoNearDupPairs(sigs, minFrames = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"pairs: $pairs")
    assert(pairs((1L, 2L)) >= 3) // the three byte-identical frames match
    // stub-demuxed garbage contributes no signatures (no decodable pixels)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val withJunk = Seq(MediaRow(9L, "video", garbage)).toDS()
    assert(Multimodal.framePhashes(withJunk, stride = 1).count() === 0)
  }

  test("REAL audio decode: generated WAV/AIFF through decode → features") {
    import Multimodal.MediaRow
    import spark.implicits._
    // PCM fixture writers: the same samples as little-endian WAV and
    // big-endian AIFF must decode to bit-identical features
    def encodeAudio(tpe: javax.sound.sampled.AudioFileFormat.Type, bigEndian: Boolean,
        sampleRate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate, 16, channels, 2 * channels, sampleRate, bigEndian)
      val raw = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val lo = (samples(i) & 0xff).toByte
        val hi = ((samples(i) >> 8) & 0xff).toByte
        if (bigEndian) { raw(2 * i) = hi; raw(2 * i + 1) = lo }
        else { raw(2 * i) = lo; raw(2 * i + 1) = hi }
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF

    // 1 second of 440 Hz sine at 8 kHz mono, amplitude 16384 (half scale)
    val sine = Array.tabulate[Short](8000)(i =>
      math.round(16384 * math.sin(2 * math.Pi * 440 * i / 8000)).toShort)
    val silence = new Array[Short](4000)
    // 0.5 s stereo: sine left, silence right, interleaved
    val stereo = Array.tabulate[Short](8000)(i =>
      if (i % 2 == 0) sine(i / 2) else 0)
    val garbage = Array.tabulate[Byte](64)(i => (i * 13).toByte)

    val media = Seq(
      MediaRow(1L, "audio", encodeAudio(wave, bigEndian = false, 8000f, 1, sine)),
      MediaRow(2L, "audio", encodeAudio(wave, bigEndian = false, 8000f, 1, silence)),
      MediaRow(3L, "audio", encodeAudio(wave, bigEndian = false, 8000f, 2, stereo)),
      MediaRow(4L, "audio", garbage)
    ).toDS().repartition(3)
    val feats = Multimodal.extractFeatures(media).collect().map(r => r.doc_id -> r).toMap

    // typed metadata: width = sample rate (Hz), height = channels
    assert((feats(1L).width, feats(1L).height) === (8000, 1))
    assert((feats(3L).width, feats(3L).height) === (8000, 2))
    // sine: RMS ≈ A/√2, peak ≈ A/full, ZCR ≈ 2f/rate, no DC, 1 s duration
    assert(math.abs(feats(1L).features(0) - 16384.0 / math.sqrt(2) / 32768) < 1e-3)
    assert(math.abs(feats(1L).features(1) - 0.5f) < 1e-3)
    assert(math.abs(feats(1L).features(2) - 2.0 * 440 / 8000) < 1e-3)
    assert(math.abs(feats(1L).features(3)) < 1e-3)
    assert(math.abs(feats(1L).features(4)) < 1e-3)          // log2(1 s) = 0
    assert(math.abs(feats(1L).features(6) - 0.125f) < 1e-6) // 1 channel / 8
    // silence: all level features exactly zero, 0.5 s → log2 = -1
    assert(feats(2L).features.take(4).forall(_ == 0.0f))
    assert(math.abs(feats(2L).features(4) + 1.0f) < 1e-3)
    // stereo halves the per-channel duration at the same sample count
    assert(math.abs(feats(3L).features(4) + 1.0f) < 1e-3)
    // garbage payload fell back to the deterministic stub
    val (gw, gh, gf) = Multimodal.decodeStub("audio", garbage)
    assert((feats(4L).width, feats(4L).height, feats(4L).features.toSeq) ===
      (gw, gh, gf.toSeq))

    // format independence: AIFF (big-endian) decodes bit-identically to WAV
    val viaWav = Multimodal.decode("audio", encodeAudio(wave, bigEndian = false, 8000f, 1, sine))
    val viaAiff = Multimodal.decode("audio", encodeAudio(aiff, bigEndian = true, 8000f, 1, sine))
    assert(viaWav._1 === viaAiff._1 && viaWav._2 === viaAiff._2)
    assert(viaWav._3.toSeq === viaAiff._3.toSeq)
    // features equal the same functions applied driver-side (bit-stable)
    val Some((rate, ch, samples)) =
      Multimodal.decodeAudio(encodeAudio(wave, bigEndian = false, 8000f, 1, sine))
    assert(rate === 8000f && ch === 1 && samples.toSeq === sine.toSeq)
    assert(feats(1L).features.toSeq ===
      Multimodal.audioFeatures(rate, ch, samples).toSeq)
    // a TRUNCATED payload with a valid RIFF header must also fall back to
    // the stub (pipeline totality), not fail the task
    val truncated = encodeAudio(wave, bigEndian = false, 8000f, 1, sine).take(40)
    val tf = Multimodal.decode("audio", truncated)
    val (tw, th, ts) = Multimodal.decodeStub("audio", truncated)
    assert((tf._1, tf._2, tf._3.toSeq) === (tw, th, ts.toSeq))
  }


  test("REAL video demux: generated MJPEG-AVI through demux → frames → decode") {
    import spark.implicits._
    import Multimodal.MediaRow

    val jpegs = Seq(0xc04030, 0x4080c0, 0x208020, 0x804020, 0x2040a0, 0x909090)
      .map(jpegFrame(32, 20, _))
    val avi = muxAvi(jpegs, usPerFrame = 40000, w = 32, h = 20)

    // demux recovers every frame payload byte-identically, 25 fps clock
    val Some(frames) = Multimodal.demuxAvi(avi)
    assert(frames.map(_._1) === (0 until 6))
    assert(frames.map(_._2) === Seq(0L, 40L, 80L, 120L, 160L, 200L))
    assert(frames.map(_._3.toSeq) === jpegs.map(_.toSeq))

    // decode("video") = real dims + pixel features of the first keyframe
    val (vw, vh, vf) = Multimodal.decode("video", avi)
    val first = Multimodal.decodeImage(jpegs.head).get
    assert((vw, vh) === (32, 20))
    assert(vf.toSeq === Multimodal.imageFeatures(first).toSeq)

    // sampleFrames takes the REAL path for AVI rows and the stub for the
    // rest, in the same partition-parallel pass; each real frame then
    // decodes through the IMAGE path (MJPEG frame = complete JPEG)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val media = Seq(MediaRow(1L, "video", avi), MediaRow(2L, "video", garbage))
      .toDS().repartition(2)
    val byDoc = Multimodal.sampleFrames(media, stride = 2).collect().groupBy(_.doc_id)
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    assert(byDoc(1L).forall(f => f.ts_ms == f.frame_idx * 40L))
    assert(byDoc(1L).forall { f =>
      val img = Multimodal.decodeImage(f.frame).get
      img.getWidth == 32 && img.getHeight == 20
    })
    assert(byDoc(2L).map(_.frame_idx).sorted.toSeq ===
      Multimodal.demuxStub(garbage).map(_._1).filter(_ % 2 == 0).toSeq)

    // totality: truncating the container mid-chunk falls back to the stub
    val cut = avi.take(avi.length / 2)
    assert(Multimodal.demuxAvi(cut).isEmpty)
    val (sw, sh, sf) = Multimodal.decodeStub("video", cut)
    val dec = Multimodal.decode("video", cut)
    assert((dec._1, dec._2, dec._3.toSeq) === (sw, sh, sf.toSeq))
    // and an AVI whose frames are not decodable images still demuxes but
    // decode falls back (demux ≠ decode totality are independent)
    val junkAvi = muxAvi(Seq(garbage), usPerFrame = 40000, w = 8, h = 8)
    assert(Multimodal.demuxAvi(junkAvi).exists(_.map(_._3.toSeq) === Seq(garbage.toSeq)))
    val dj = Multimodal.decode("video", junkAvi)
    val (jw, jh, jf) = Multimodal.decodeStub("video", junkAvi)
    assert((dj._1, dj._2, dj._3.toSeq) === (jw, jh, jf.toSeq))
  }

  test("frame sampling and resize: UDTF fan-out, stride, aspect-preserving clamp") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs, partitions = 4)
    val all = Multimodal.sampleFrames(media, stride = 1).collect()
    val sampled = Multimodal.sampleFrames(media, stride = 3).collect()
    assert(all.nonEmpty && sampled.nonEmpty)
    // stride filters exactly the frames whose index is a multiple of 3
    val byDoc = all.groupBy(_.doc_id)
    assert(sampled.groupBy(_.doc_id).forall { case (d, fs) =>
      fs.map(_.frame_idx).sorted.toSeq ===
        byDoc(d).map(_.frame_idx).filter(_ % 3 == 0).sorted.toSeq
    })
    // frame timestamps follow the 25fps stub clock; payloads deterministic
    assert(all.forall(f => f.ts_ms == f.frame_idx * 40L && f.frame.length == 16))

    val feats = Multimodal.extractFeatures(media)
    val small = Multimodal.resize(feats, maxDim = 64).collect()
    val orig = feats.collect().map(r => r.doc_id -> r).toMap
    assert(small.forall(r => math.max(r.width, r.height) <= 64))
    assert(small.forall { r =>
      val o = orig(r.doc_id)
      val longSide = math.max(o.width, o.height)
      if (longSide <= 64) (r.width, r.height) === (o.width, o.height) // never upscaled
      else (r.width, r.height) ===
        (math.max(1, o.width * 64 / longSide), math.max(1, o.height * 64 / longSide))
    })
    assert(small.forall(r => r.features.toSeq == orig(r.doc_id).features.toSeq))
  }
}
