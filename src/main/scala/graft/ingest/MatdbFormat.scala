package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.{Dimension, MatSchema, Scan, ValueCol}

/** Reader/writer for the REFERENCE's on-disk database format (ejrh/matdb) —
  * the migration path for existing matdb directories (VERDICT r1 "what's
  * missing" #1). Capability parity elsewhere is format-free by design
  * (SURVEY.md §1.5); this codec closes the one gap a migrating user hits.
  *
  * Format, from the reference sources (studied, not copied):
  *   - Database dir: `schema.json` + one file per flushed segment named
  *     `{txn:08x}.{seg:08x}` committed / `….tmp` uncommitted
  *     (storage.rs:86-111).
  *   - Segment file (segment.rs:138-200): per block a 6-byte `MD:BLK` tag +
  *     one zstd frame of the block payload; then `MD:SEG` + a zstd frame of
  *     the footer (u16 nBlocks, u16 nDims, per block nDims×u64BE min bounds,
  *     nDims×u64BE max bounds, u64BE block offset); then `MD:END` + u64BE
  *     footer offset. Readers seek to EOF−14, jump to the footer, then to
  *     blocks (segment.rs:48-78).
  *   - Block payload (block.rs:136-199): u16 nDims; per dim u32 size +
  *     size×u64BE sorted coordinate values; then one missing byte per cell
  *     (1=absent) over the dense cell grid (∏ sizes cells), then u64BE
  *     values packed for present cells in sequential cell order — exactly
  *     the order BlockIter walks (block.rs:238-294: value_index increments
  *     by one per cell, a row-major odometer over the coordinate arrays).
  *     (The write-side index math block.rs:52-65 degrades for ≥3 dims;
  *     decode follows the iterator, which is what the reference itself
  *     yields back.)
  *   - All integers are big-endian u64 on the wire (`Datum = usize`,
  *     lib.rs:27); values ≥ 2^63 are out of scope (SURVEY.md §7.4).
  *   - One physical value per cell: with multiple declared value columns the
  *     reference overwrites the same cell per column (block.rs:45-49) and
  *     iterates a single value — the decoder surfaces it under the FIRST
  *     value column name.
  *
  * Read path is distributed: the driver lists segment files; executors
  * decode whole files (`flatMap` over a file RDD — genuinely per-partition
  * imperative logic). Resolution reuses the engine's own MVCC dedup
  * ([[graft.core.Scan.dedup]]) with `_txn_id` from the filename and `_seq` =
  * segment number (the documented newest-wins intent, scan.rs:38-54).
  *
  * The writer is a single-process export utility (the target format is
  * itself single-process): rows stream through the driver grouped by chunk
  * key; per-chunk dense blocks are bounded by ∏ chunk sizes cells.
  */
object MatdbFormat {

  private val TagLen = 6
  private val BlkTag = "MD:BLK".getBytes(StandardCharsets.US_ASCII)
  private val SegTag = "MD:SEG".getBytes(StandardCharsets.US_ASCII)
  private val EndTag = "MD:END".getBytes(StandardCharsets.US_ASCII)

  private val SegName = """^([0-9a-fA-F]+)\.([0-9a-fA-F]+)$""".r

  // ---- schema.json (serde_json of schema.rs:10-25) ----------------------

  /** Parse the reference's schema.json: {"dimensions":[{"name":…,
    * "chunk_size":…}…],"values":[{"name":…}…]} (regex-parsed like the
    * engine's other metadata documents — dependency-free). */
  def parseSchemaJson(json: String): MatSchema = {
    def section(key: String): String = {
      val m = (s""""$key"\\s*:\\s*\\[""").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"schema.json: no $key"))
      json.substring(m.end, json.indexOf(']', m.end))
    }
    val dimRe = """\{\s*"name"\s*:\s*"([^"]+)"\s*,\s*"chunk_size"\s*:\s*(\d+)\s*\}""".r
    val valRe = """"name"\s*:\s*"([^"]+)"""".r
    val dims = dimRe.findAllMatchIn(section("dimensions"))
      .map(m => Dimension(m.group(1), m.group(2).toLong)).toSeq
    val values = valRe.findAllMatchIn(section("values")).map(m => ValueCol(m.group(1), LongType)).toSeq
    require(dims.nonEmpty, "schema.json: no dimensions")
    MatSchema(dims, values)
  }

  def schemaJson(schema: MatSchema): String = {
    val dims = schema.dimensions
      .map(d => s"""{"name":"${d.name}","chunk_size":${d.chunkSize}}""").mkString(",")
    val vals = schema.values.map(v => s"""{"name":"${v.name}"}""").mkString(",")
    s"""{"dimensions":[$dims],"values":[$vals]}"""
  }

  // ---- segment decode ---------------------------------------------------

  /** Decode one segment file: iterator of (dimension coords :+ value). */
  def decodeSegment(bytes: Array[Byte]): Iterator[Array[Long]] = {
    require(bytes.length >= TagLen + 8, "segment too short")
    val end = java.util.Arrays.copyOfRange(bytes, bytes.length - TagLen - 8, bytes.length - 8)
    require(java.util.Arrays.equals(end, EndTag), "segment missing MD:END")
    val footerPos = be64(bytes, bytes.length - 8).toInt
    expectTag(bytes, footerPos, SegTag)
    val footer = new DataInputStream(new ZstdInputStream(
      new ByteArrayInputStream(bytes, footerPos + TagLen, bytes.length - footerPos - TagLen)))
    val nBlocks = footer.readUnsignedShort()
    val nDims = footer.readUnsignedShort()
    val blockPos = (0 until nBlocks).map { _ =>
      (0 until 2 * nDims).foreach(_ => footer.readLong()) // min + max bounds
      footer.readLong()
    }
    footer.close()
    blockPos.iterator.flatMap { pos =>
      expectTag(bytes, pos.toInt, BlkTag)
      decodeBlock(new DataInputStream(new ZstdInputStream(
        new ByteArrayInputStream(bytes, pos.toInt + TagLen, bytes.length - pos.toInt - TagLen))))
    }
  }

  /** Decode one block payload eagerly (the reference holds blocks fully in
    * memory too): sequential cell walk, missing cells skipped
    * (block.rs:136-170 layout, block.rs:238-294 iteration order — cell index
    * advances by one per odometer step, last dimension fastest). */
  private def decodeBlock(in: DataInputStream): Iterator[Array[Long]] = {
    try {
      val nDims = in.readUnsignedShort()
      val dims = Array.fill(nDims) {
        val size = in.readInt()
        require(size >= 0, "negative dimension size")
        Array.fill(size)(in.readLong())
      }
      val cells = dims.foldLeft(1L)(_ * _.length)
      require(cells <= Int.MaxValue, s"block too large: $cells cells")
      val missing = new Array[Byte](cells.toInt)
      in.readFully(missing)
      val rows = Vector.newBuilder[Array[Long]]
      val odometer = new Array[Int](nDims)
      var cell = 0
      while (cell < cells) {
        if (missing(cell) == 0) {
          val r = new Array[Long](nDims + 1)
          var i = 0
          while (i < nDims) { r(i) = dims(i)(odometer(i)); i += 1 }
          r(nDims) = in.readLong()
          rows += r
        }
        var d = nDims - 1
        var carry = true
        while (d >= 0 && carry) {
          odometer(d) += 1
          if (odometer(d) < dims(d).length) carry = false else { odometer(d) = 0; d -= 1 }
        }
        cell += 1
      }
      rows.result().iterator
    } finally in.close()
  }

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def expectTag(bytes: Array[Byte], pos: Int, tag: Array[Byte]): Unit =
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, pos, pos + TagLen), tag),
      s"expected ${new String(tag, StandardCharsets.US_ASCII)} at $pos")

  // ---- database read ----------------------------------------------------

  private def committedFiles(root: Path): Seq[(Long, Int, Path)] = {
    val stream = Files.list(root)
    val all = try stream.iterator().asScala.toSeq finally stream.close()
    all.flatMap { p =>
      p.getFileName.toString match {
        case SegName(t, s) if Files.isRegularFile(p) =>
          Some((java.lang.Long.parseLong(t, 16), Integer.parseInt(s, 16), p))
        case _ => None // .tmp and foreign files ignored (database.rs:100-127)
      }
    }
  }

  /** All versions, with `_txn_id`/`_seq` provenance (`_seq` = segment
    * number: within a txn, later flushes supersede earlier ones). */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val root = Paths.get(path)
    val schema = parseSchemaJson(new String(
      Files.readAllBytes(root.resolve("schema.json")), StandardCharsets.UTF_8))
    val files = committedFiles(root).map { case (t, s, p) => (t, s, p.toString) }
    val valueName = schema.valueNames.headOption.getOrElse("value")
    val st = StructType(
      schema.dimNames.map(StructField(_, LongType, nullable = false)) ++
        Seq(StructField(valueName, LongType),
          StructField(Scan.TxnCol, LongType), StructField(Scan.SeqCol, LongType)))
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { case (txn, seg, file) =>
        decodeSegment(Files.readAllBytes(Paths.get(file)))
          .map(r => Row.fromSeq(r.toSeq ++ Seq(txn, seg.toLong)))
      }
    spark.createDataFrame(rows, st)
  }

  /** Resolved snapshot (newest version per key point) of a matdb-format
    * database — the reference's `txn.query()` as a DataFrame. */
  def readDatabase(spark: SparkSession, path: String): DataFrame = {
    val root = Paths.get(path)
    val schema = parseSchemaJson(new String(
      Files.readAllBytes(root.resolve("schema.json")), StandardCharsets.UTF_8))
    val oneValue = MatSchema(schema.dimensions, schema.values.take(1))
    Scan.dedup(readRaw(spark, path), oneValue)
  }

  /** Migrate a matdb-format database into a graft table (one transaction
    * holding the resolved snapshot; per-txn history is not carried over). */
  def migrate(spark: SparkSession, matdbPath: String, graftPath: String): graft.core.MatDb = {
    val root = Paths.get(matdbPath)
    val schema = parseSchemaJson(new String(
      Files.readAllBytes(root.resolve("schema.json")), StandardCharsets.UTF_8))
    val db = graft.core.MatDb.create(spark, MatSchema(schema.dimensions, schema.values.take(1)), graftPath)
    val txn = db.newTransaction()
    txn.addRows(readDatabase(spark, matdbPath))
    txn.commit()
    db
  }

  // ---- database write (export utility) ----------------------------------

  /** Export `df` (columns = dims :+ one value) as ONE committed segment of a
    * matdb-format database at `path`, creating schema.json if absent.
    * Driver-streaming by design — the target is a single-process format;
    * rows arrive chunk-grouped and dim-sorted so each dense block is bounded
    * by ∏ chunkSize cells. */
  def writeDatabase(df: DataFrame, path: String, schema: MatSchema, txnId: Long = 1L): Unit = {
    require(schema.values.size == 1,
      "matdb export writes one value column (the reference stores one physical value per cell, block.rs:45-49)")
    val root = Paths.get(path)
    Files.createDirectories(root)
    val schemaFile = root.resolve("schema.json")
    if (!Files.exists(schemaFile))
      Files.write(schemaFile, schemaJson(schema).getBytes(StandardCharsets.UTF_8))

    val chunkExprs = schema.dimensions.map(d =>
      floor(col(d.name) / lit(d.chunkSize)).cast("long"))
    val ordered = df
      .select((schema.dimNames ++ schema.valueNames).map(col): _*)
      .orderBy(chunkExprs ++ schema.dimNames.map(col): _*)

    val out = new ByteArrayOutputStream()
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Array[Long], Long)]
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    var currentChunk: Seq[Long] = null
    def chunkOf(r: Array[Long]): Seq[Long] =
      schema.dimensions.zipWithIndex.map { case (d, i) => Math.floorDiv(r(i), d.chunkSize) }
    def flushBlock(): Unit = if (pending.nonEmpty) {
      val pos = out.size().toLong
      out.write(BlkTag)
      val (mins, maxs) = encodeBlock(out, pending.toSeq, schema.dimensions.size)
      blocks += ((mins, maxs, pos))
      pending.clear()
    }
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val arr = Array.tabulate(schema.dimensions.size + 1)(i => row.getLong(i))
      val ck = chunkOf(arr)
      if (currentChunk != null && ck != currentChunk) flushBlock()
      currentChunk = ck
      pending += arr
    }
    flushBlock()
    require(blocks.size <= 0xffff, s"too many blocks for one segment: ${blocks.size}")
    require(blocks.nonEmpty, "refusing to export an empty database (no blocks)")

    val footerPos = out.size().toLong
    out.write(SegTag)
    val fz = new DataOutputStream(new ZstdOutputStream(out, 1))
    fz.writeShort(blocks.size)
    fz.writeShort(schema.dimensions.size)
    blocks.foreach { case (mins, maxs, pos) =>
      mins.foreach(fz.writeLong); maxs.foreach(fz.writeLong); fz.writeLong(pos)
    }
    fz.close()
    out.write(EndTag)
    val endBuf = new DataOutputStream(out)
    endBuf.writeLong(footerPos)
    endBuf.flush()

    Files.write(root.resolve(f"$txnId%08x.${0}%08x"), out.toByteArray)
  }

  /** Encode one dense block (block.rs:136-199 layout); returns min/max
    * bounds per dimension (block.rs:210-232 semantics). */
  private def encodeBlock(out: ByteArrayOutputStream, rows: Seq[Array[Long]],
      nDims: Int): (Array[Long], Array[Long]) = {
    val coords = (0 until nDims).map(i => rows.map(_(i)).distinct.sorted.toArray)
    val strides = new Array[Long](nDims)
    var s = 1L
    for (i <- (nDims - 1) to 0 by -1) { strides(i) = s; s *= coords(i).length }
    val cells = s
    require(cells <= Int.MaxValue, s"dense block too large: $cells cells")
    val values = new Array[java.lang.Long](cells.toInt)
    rows.foreach { r =>
      var idx = 0L
      for (i <- 0 until nDims)
        idx += strides(i) * java.util.Arrays.binarySearch(coords(i), r(i))
      values(idx.toInt) = r(nDims) // same-key re-add: last wins (block.rs:47-49)
    }
    val z = new DataOutputStream(new ZstdOutputStream(out, 1))
    z.writeShort(nDims)
    coords.foreach { c => z.writeInt(c.length); c.foreach(z.writeLong) }
    values.foreach(v => z.writeByte(if (v == null) 1 else 0))
    values.foreach(v => if (v != null) z.writeLong(v))
    z.close()
    (coords.map(_.head).toArray, coords.map(_.last).toArray)
  }
}
