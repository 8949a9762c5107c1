package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{MatSchema, Scan, SegmentId, Storage}

/** Cross-process-safe append for the SQL write path ([[GraftCatalog]]'s
  * `INSERT INTO` / CTAS): commits `df` as ONE transaction without an open
  * [[graft.core.MatDb]] handle.
  *
  * Why not `MatDb.open(...).newTransaction()`: `open` allocates txn ids
  * from an in-process counter seeded at open time — two PROCESSES that
  * opened at the same version allocate the SAME id and, under the manifest
  * protocol, write part files into the SAME final-name directory before
  * either commit can detect the collision. `open` also runs the recovery
  * sweep, which would delete another live writer's in-flight directories.
  * A SQL endpoint must assume concurrent INSERTs, so this path:
  *
  *   1. CLAIMS the txn id by atomically creating its segment-0 directory —
  *      `Files.createDirectory` is put-if-absent at the filesystem, the
  *      same optimistic shape as the manifest protocol's `createLink`
  *      publish (Storage.scala) and the bucketed layout's partition claim
  *      (BucketedGraft.claimTxnId). A taken name (live writer, or a crash
  *      orphan awaiting sweep) just advances the candidate; a claimed-
  *      then-crashed insert leaves an unreferenced directory that the next
  *      `MatDb.open` recovery sweeps, its id burned — identical to a
  *      crashed transaction.
  *   2. Writes the decorated batch INTO the claimed directory (same chunk
  *      routing, dimension-metadata, sort and codec as Transaction.flush —
  *      one shuffle keyed on the chunk columns).
  *   3. Publishes through the table's own protocol `commit`: manifest
  *      tables get the optimistic multi-writer publish loop, rename
  *      tables the segment-0-last rename order.
  *
  * Two concurrent catalog INSERTs therefore commit distinct, sequential
  * transactions with both data sets visible — GraftCatalogSpec races them.
  * The reference allocates ids in-process with no guard (database.rs:74-79);
  * this is the multi-writer counterpart its single-process model never
  * needed. Empty batches claim, detect emptiness from the written files,
  * drop the claim, and commit nothing (no burned id, same contract as
  * BucketedGraft.append). */
object GraftInsert {

  /** Append `df` to the graft table at `dir` as one transaction; returns
    * the committed txn id, or None when `df` was empty. */
  def append(spark: SparkSession, dir: String, df: DataFrame): Option[Long] =
    commitBatch(spark, dir, df, tombstone = false)

  /** Commit TOMBSTONES for the key points in `df` as one transaction — the
    * cross-process `DELETE FROM` write path ([[GraftCatalog]]'s
    * `SupportsDelete`). Same claim + chunk-routed write + protocol publish
    * as [[append]]; the rows just carry null values and `_del = true`, so
    * the MVCC resolve retires the keys ([[graft.core.Scan.dedup]]).
    *
    * `serializableSince`: when the table runs
    * `graft.isolation = serializable`, the snapshot watermark the doomed
    * keys were RESOLVED against — the publish then conflict-checks
    * against transactions committed above it ([[publishConflictChecked]])
    * so a filter-DELETE gets the same no-lost-update guarantee as the
    * row-level paths. None = newest-wins (default). */
  def tombstone(spark: SparkSession, dir: String, keys: DataFrame,
      serializableSince: Option[Long] = None): Option[Long] =
    commitBatch(spark, dir, keys, tombstone = true, serializableSince)

  /** `INSERT OVERWRITE` / `TRUNCATE`: replace the table contents in ONE
    * transaction. Cost is O(new data), not O(old table):
    *
    *   - **Manifest protocol** — a replace publish: the new rows are written
    *     to one claimed segment and the manifest flips to exactly that set
    *     (`visibleAfter = [new segment]`), the same atomic mechanism
    *     [[graft.core.MatDb.overwrite]] and `checkpoint()` use. The old
    *     state is never read and never tombstoned — a daily 100 TB refresh
    *     costs the new day's write, not a full-table scan. Old manifests
    *     keep the replaced state readable for `VERSION AS OF` until vacuum.
    *     The publish is conflict-checked (expectedBase CAS): if any commit
    *     lands between claim and publish it retries, RETAINING segments
    *     with a txn id above the overwrite's own — newest-txn-wins, now
    *     enforced at publish time rather than assumed from a pre-claim
    *     resolve (the round-10 race: an append committing between resolve
    *     and publish kept its keys alive despite the overwrite being
    *     newer).
    *   - **Rename protocol** (no atomic swap) — the tombstone-all shape:
    *     tombstones for every currently-live key (`_seq` 0) UNIONed with
    *     the new rows (`_seq` 1, outranking their own transaction's
    *     tombstone on overlapping keys). The txn id is claimed BEFORE the
    *     live set is resolved, narrowing the same race to the
    *     single-writer window the rename protocol already assumes.
    *
    * Either way: readers see the old state until the publish flips,
    * `VERSION AS OF` below the overwrite keeps reading, and txn ids stay
    * monotone (a TRUNCATE's id is recorded as the manifest's producing txn
    * even though no segment carries it) — so stream offsets never rewind.
    * TRUNCATE is the degenerate empty-source case. */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Option[Long] = {
    val root = Storage.rootPath(dir)
    val schema = Storage.readSchema(root)
    Storage.detect(root) match {
      case m if m == Storage.ManifestProtocol =>
        overwriteReplace(root, m, schema, df)
      case proto =>
        val (segId, segPath) = claimSegment(root, proto)
        val paths = proto.listCommitted(root).sorted
          .map(s => proto.readPath(root, s).toString)
        val doomed = Scan.resolve(spark, schema, paths, Nil, None)
          .select(schema.dimNames.map(col): _*)
        writeClaimed(root, proto, schema, segId, segPath,
          decorate(schema, doomed, tombstone = true, seq = 0L)
            .unionByName(decorate(schema, df, tombstone = false, seq = 1L)))
    }
  }

  /** Manifest-table overwrite: claim, write the new rows, replace-publish.
    * Always returns the claimed txn id — an overwrite commits even when
    * `df` is empty (that IS the truncate). */
  private def overwriteReplace(root: Path, proto: graft.core.Protocol,
      schema: MatSchema, df: DataFrame): Option[Long] = {
    val (segId, segPath) = claimSegment(root, proto)
    decorate(schema, df, tombstone = false, seq = 0L)
      .withColumn(Scan.TxnCol, lit(segId.txnId))
      .repartition(schema.chunkColNames.map(col): _*)
      .sortWithinPartitions(schema.dimNames.map(col): _*)
      .write.mode("append")
      .option("compression", "zstd")
      .options(Storage.parquetWriteOptions(Storage.readProps(root)))
      .partitionBy(schema.chunkColNames: _*)
      .parquet(segPath.toString)
    val newIds = if (hasDataFiles(segPath)) Seq(segId) else Seq.empty[SegmentId]
    var tries = 0
    while (tries < 16) {
      val base = proto.listCommitted(root)
      // newest-txn-wins across writers: a commit that claimed a LATER txn
      // id than this overwrite survives it (same answer the tombstone path
      // gives per-key); everything older is replaced away
      val keep = base.filter(_.txnId > segId.txnId)
      try {
        proto.replace(root, newIds, (newIds ++ keep).sorted, base,
          prodTxn = segId.txnId)
        // an empty claim dir (TRUNCATE) is not referenced by the manifest —
        // drop it now that the producing txn is durably recorded
        if (newIds.isEmpty) Storage.deleteRecursively(segPath)
        return Some(segId.txnId)
      } catch {
        case _: java.util.ConcurrentModificationException => tries += 1
      }
    }
    // never-published claim: reclaim it now (matching publishConflictChecked)
    // instead of leaving an orphan until the 24h claim retention expires
    Storage.deleteRecursively(segPath)
    throw new IllegalStateException(
      "INSERT OVERWRITE: too many concurrent commits; giving up after 16 retries")
  }

  /** CLAIM a fresh transaction's segment-0 directory put-if-absent — the
    * cross-process id allocation shared by the SQL INSERT/DELETE path and
    * the row-level delta write ([[GraftDeltaBatchWrite]]). The candidate id
    * outranks everything committed OR on disk (orphans burn their id
    * exactly like MatDb recovery treats them); `Files.createDirectory` is
    * atomic at the filesystem, so concurrent claimants get distinct ids. */
  private[sources] def claimSegment(root: Path,
      proto: graft.core.Protocol): (SegmentId, Path) = {
    // the watermark covers the committed set AND the manifest's producing
    // txn — a replace-truncate leaves no segments, yet its id stays burned
    val onDisk = list(root).flatMap(p => Storage.decode(p.getFileName.toString))
      .map(_._1.txnId)
    var txn = (onDisk :+ proto.txnWatermark(root)).max + 1L
    while (true) {
      val id = SegmentId(txn, 0)
      val p = proto.writePath(root, id)
      if (Storage.casStore(root).claimDirectory(p)) {
        // claim wall-clock stamp: keeps GC's grace honest for writes that
        // outlast the mtime grace (Storage.stampClaim scaladoc)
        Storage.stampClaim(p)
        return (id, p)
      } else txn += 1L
    }
    throw new IllegalStateException("unreachable")
  }

  private def commitBatch(spark: SparkSession, dir: String, df: DataFrame,
      tombstone: Boolean, serializableSince: Option[Long] = None): Option[Long] = {
    val root = Storage.rootPath(dir)
    val schema = Storage.readSchema(root)
    val proto = Storage.detect(root)
    commitFrame(root, proto, decorate(schema, df, tombstone, seq = 0L),
      serializableSince)
  }

  /** Decorate exactly as Transaction.flush: dims carry their chunk size in
    * field metadata (ChunkPruneRule reads it), chunk columns derived, and
    * the `_del`/`_seq` provenance set per frame — `_txn_id` is stamped by
    * [[commitFrame]] once the id is claimed. */
  private def decorate(schema: MatSchema, df: DataFrame,
      tombstone: Boolean, seq: Long): DataFrame = {
    val dimCols = schema.dimensions.map { dim =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(MatSchema.ChunkKey, dim.chunkSize).build()
      col(dim.name).as(dim.name, md)
    }
    val projected =
      if (tombstone)
        // tombstone rows: dimensions only, value columns null
        schema.values.foldLeft(df.select(dimCols: _*)) { (d, v) =>
          d.withColumn(v.name, lit(null).cast(v.dataType))
        }
      else df.select(dimCols ++ schema.valueNames.map(col): _*)
    val withChunks = schema.dimensions.foldLeft(projected) { (d, dim) =>
      d.withColumn(schema.chunkColName(dim.name),
        graft.core.MatSchema.chunkKeyCol(col(dim.name), dim.chunkSize))
    }
    withChunks
      .withColumn(Scan.DelCol, lit(tombstone))
      .withColumn(Scan.SeqCol, lit(seq))
  }

  /** Claim a txn id, write the decorated frame chunk-routed into the
    * claimed directory, publish through the table's protocol — one
    * transaction (rows route with one shuffle keyed on the chunk columns,
    * sorted by dims for row-group stats). */
  private def commitFrame(root: Path, proto: graft.core.Protocol,
      frame: DataFrame, serializableSince: Option[Long] = None): Option[Long] = {
    val schema = Storage.readSchema(root)
    val (segId, segPath) = claimSegment(root, proto)
    writeClaimed(root, proto, schema, segId, segPath, frame, serializableSince)
  }

  private def writeClaimed(root: Path, proto: graft.core.Protocol,
      schema: MatSchema, segId: SegmentId, segPath: Path,
      frame: DataFrame, serializableSince: Option[Long] = None): Option[Long] = {
    frame
      .withColumn(Scan.TxnCol, lit(segId.txnId))
      .repartition(schema.chunkColNames.map(col): _*)
      .sortWithinPartitions(schema.dimNames.map(col): _*)
      .write.mode("append")
      .option("compression", "zstd")
      .options(Storage.parquetWriteOptions(Storage.readProps(root)))
      .partitionBy(schema.chunkColNames: _*)
      .parquet(segPath.toString)
    if (hasDataFiles(segPath)) {
      serializableSince match {
        case Some(h) =>
          val ours = maybeWriteKeyDigest(frame.sparkSession, schema, root, segPath)
          publishConflictChecked(root, proto, segId, segPath, h, ours)
        case None =>
          // publish against the CURRENT committed set — concurrent writers
          // may have committed while this batch was writing (newest-wins)
          proto.commit(root, Seq(segId), (proto.listCommitted(root) :+ segId).sorted)
      }
      Some(segId.txnId)
    } else {
      Storage.deleteRecursively(segPath)
      None
    }
  }

  /** Under `graft.isolation.granularity = 'key'`: compute the delta's
    * touched-key digest (xxhash64 of the dim tuple, read back from the
    * just-written segment — one scan of our OWN small delta) and persist it
    * as `<segdir>/_keys` BEFORE publish, so concurrent checkers can
    * exonerate us. Up to [[graft.core.Storage.KeyDigestCap]] keys the
    * digest is EXACT; above it a fixed-rate bloom filter (fpp 0.1%) keeps
    * key-precision for large deltas — disjointness proofs against a bloom
    * stay sound (negatives are certain), a false positive only produces a
    * spurious abort. Returns the digest for OUR side of the check; None
    * when the granularity is chunk. */
  private[sources] def maybeWriteKeyDigest(spark: SparkSession, schema: MatSchema,
      root: Path, segPath: Path): Option[Storage.KeyDigest] =
    if (!Storage.readProps(root).get(GraftCatalog.GranularityProp).contains("key")) None
    else {
      val hashes = spark.read.parquet(segPath.toString)
        .select(xxhash64(schema.dimNames.map(col): _*).as("h"))
        .distinct()
      val rows = hashes.limit(Storage.KeyDigestCap + 1).collect()
      if (rows.length <= Storage.KeyDigestCap) {
        val keys = rows.map(_.getLong(0)).toSet
        Storage.writeKeyDigest(segPath, keys)
        Some(Storage.ExactKeys(keys))
      } else {
        // over the cap: one distributed count + one bloom aggregate over
        // our own delta — never collected to the driver
        val n = hashes.count()
        val bloom = hashes.stat.bloomFilter("h", math.max(n, 1L), 0.001)
        Storage.writeBloomDigest(segPath, bloom)
        Some(Storage.BloomKeys(bloom))
      }
    }

  /** Publish a claimed, fully-written segment under SERIALIZABLE conflict
    * detection: any transaction committed after `readHorizon` whose
    * segment touches the same CHUNK keys aborts this commit with
    * `ConcurrentModificationException` (the claim directory is deleted —
    * the statement can simply be retried against the current state). On
    * manifest tables the publish is a CAS `replace` on the exact base the
    * check inspected, re-checked on every lost race, so no window remains
    * between check and publish; rename tables get the check plus the
    * protocol's single-writer assumption. Chunk granularity is
    * conservative (a same-chunk different-key writer also aborts) — the
    * same shape as Delta's file-level conflict detection, one level
    * coarser. Shared by the row-level delta write
    * ([[GraftDeltaBatchWrite]]) and the serializable filter-DELETE. */
  private[sources] def publishConflictChecked(root: Path, proto: graft.core.Protocol,
      segId: SegmentId, segPath: Path, readHorizon: Long,
      ourKeys: Option[Storage.KeyDigest] = None): Unit = {
    lazy val ours = chunkKeys(segPath) // our OWN just-written delta — one walk
    // conflicting txn ids committed above the horizon, or empty
    def conflictTxns(base: Seq[SegmentId]): Seq[Long] = {
      // metadata path (manifest tables, round 12+): each manifest version
      // records its commit's txns + touched chunks + replace flag, so the
      // check is O(commits since horizon) single-file reads — no segment
      // file-tree walks, flat in table file count. A replace
      // (overwrite/TRUNCATE/compact) removes rows in arbitrary chunks, so
      // it conflicts with EVERY row-level write — the dir-walk fallback
      // cannot see a truncate (it leaves no segments) and silently missed
      // this case before chunk recording existed.
      val meta = proto match {
        case m if m == Storage.ManifestProtocol =>
          Storage.ManifestProtocol.commitsAfter(root, readHorizon).map(_.flatMap { c =>
            val chunkOverlap = c.chunks.forall(_.exists(ours.contains))
            // key exoneration (granularity = 'key'): a same-chunk commit
            // whose recorded key digest is PROVABLY disjoint from ours is
            // write-serializable after all — no abort. Digests are exact
            // up to the cap and bloom above it ([[Storage.KeyDigest]]);
            // any side without a digest (bulk append,
            // pre-key-granularity) stays chunk-granular, the conservative
            // direction — as do two over-cap bloom sides (no sound
            // emptiness test between blooms).
            val keyDisjoint = !c.isReplace && chunkOverlap && (ourKeys match {
              case Some(mine) if c.newSegs.nonEmpty =>
                val theirs = c.newSegs.map(id =>
                  Storage.readKeyDigest(proto.readPath(root, id)))
                theirs.forall(_.isDefined) &&
                  theirs.flatten.forall(_.provablyDisjoint(mine))
              case _ => false
            })
            val overlap = c.isReplace || (chunkOverlap && !keyDisjoint)
            if (overlap && (c.newTxns.nonEmpty || c.isReplace))
              if (c.newTxns.nonEmpty) c.newTxns else Seq(c.prodTxn)
            else Seq.empty
          })
        case _ => None
      }
      meta.getOrElse {
        // fallback (rename protocol, or manifests predating chunk
        // recording): walk each later segment's directory tree
        base.filter(_.txnId > readHorizon).filter(s =>
          chunkKeys(proto.readPath(root, s)).exists(ours.contains)).map(_.txnId)
      }
    }
    var tries = 0
    while (true) {
      val base = proto.listCommitted(root)
      if (proto.txnWatermark(root) > readHorizon) {
        val conflicts = conflictTxns(base)
        if (conflicts.nonEmpty) {
          Storage.deleteRecursively(segPath)
          throw new java.util.ConcurrentModificationException(
            s"serializable row-level conflict: transaction(s) " +
              s"${conflicts.distinct.sorted.mkString(", ")} committed " +
              s"after this statement's snapshot (txn $readHorizon) and touched the " +
              "same chunks; re-run the statement against the current state")
        }
      }
      if (proto != Storage.ManifestProtocol) {
        proto.commit(root, Seq(segId), (base :+ segId).sorted)
        return
      }
      try {
        proto.replace(root, Seq(segId), (base :+ segId).sorted, base, segId.txnId)
        return
      } catch {
        case e: java.util.ConcurrentModificationException =>
          // lost the CAS: something committed between check and publish —
          // loop to re-run the conflict check against the new base
          tries += 1
          if (tries >= 16) { Storage.deleteRecursively(segPath); throw e }
      }
    }
  }

  /** Chunk-key directories (relative paths like `_ck_t=3/_ck_s=1`) holding
    * data files under a segment — the conflict-detection granularity
    * ([[graft.core.Storage.chunkDirsOf]], the same walk the manifest
    * publisher records). */
  private[sources] def chunkKeys(segDir: Path): Set[String] =
    Storage.chunkDirsOf(segDir).toSet

  private def list(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
      finally s.close()
    }

  /** Any real data file under the claimed directory (chunk subdirs
    * included)? Commit markers and hidden files don't count — the same
    * emptiness rule as BucketedGraft.partitionHasData. */
  private def hasDataFiles(p: Path): Boolean = {
    val name = p.getFileName.toString
    if (Files.isDirectory(p)) list(p).exists(hasDataFiles)
    else !name.startsWith("_") && !name.startsWith(".")
  }
}
