package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Segment identity: one parquet directory written by one flush of one
  * transaction. Reference: `SegmentId = (TransactionId, SegmentNum)`
  * (lib.rs:29-34). */
final case class SegmentId(txnId: Long, segNum: Int) extends Ordered[SegmentId] {
  def compare(that: SegmentId): Int = {
    val c = java.lang.Long.compare(txnId, that.txnId)
    if (c != 0) c else Integer.compare(segNum, that.segNum)
  }
}

/** How segment visibility is committed and recovered. Two interchangeable
  * implementations behind one interface (both pass the same CoreSpec suite):
  *
  *   - [[Storage.RenameProtocol]] — the reference's design
  *     (storage.rs:86-111): segments are written as `.tmp` directories and a
  *     commit renames them visible in reverse order, segment 0 last as the
  *     commit marker (transaction.rs:127-136). Visibility IS the directory
  *     listing. Requires atomic rename — true on POSIX filesystems and HDFS,
  *     false on object stores.
  *
  *   - [[Storage.ManifestProtocol]] — lakehouse-style: segments are written
  *     directly under their final names but are invisible until a manifest
  *     file `_log/<version>.json` (listing the FULL visible segment set)
  *     lands via a single-file atomic move. Object-store safe (one
  *     put-if-absent), supports atomic REPLACE (overwrite/compact swap the
  *     whole set in one manifest), and is the natural base for optimistic
  *     multi-writer (a concurrent commit loses the rename race and retries).
  *
  * A table's protocol is self-describing: `_log/` exists ⇔ manifest.
  */
sealed trait Protocol {
  def name: String

  /** Directory a flush writes segment `id` into (uncommitted). */
  def writePath(root: Path, id: SegmentId): Path

  /** Directory of a COMMITTED segment. */
  def readPath(root: Path, id: SegmentId): Path

  /** Make `newIds` visible; returns the ACTUAL post-commit visible set.
    * `visibleAfter` is the caller's intended set — the rename protocol
    * derives visibility from the listing and returns it as-is; the manifest
    * protocol recomputes the union from the on-disk manifest (a concurrent
    * writer may have appended since the caller's snapshot) and retries lost
    * publish races, so the returned set can be a superset of the intent. */
  def commit(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId]): Seq[SegmentId]

  /** Set the visible set to exactly `visibleAfter` (for overwrite/compact);
    * returns it. `expectedBase` is the committed set the replacement was
    * computed FROM: the manifest protocol aborts with
    * `ConcurrentModificationException` if the on-disk manifest no longer
    * equals it (any commit that landed since would be silently dropped by
    * a blind swap), and likewise if the final publish race is lost. The
    * rename protocol derives visibility from the listing and relies on the
    * caller's in-process lock for the base check; it cannot swap
    * atomically — it commits `newIds` first, so until the caller deletes
    * the superseded directories, old and new are both visible (MVCC still
    * resolves overlapping keys to the new rows; keys absent from the new
    * data resurface only in that window — documented rename-protocol
    * caveat, the reason the manifest protocol exists). */
  def replace(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId],
      expectedBase: Seq[SegmentId]): Seq[SegmentId]

  /** Delete a flushed-but-uncommitted segment (rollback). */
  def discardInFlight(root: Path, id: SegmentId): Unit

  /** Recover table state on open: sweep leftovers of crashed transactions,
    * return (committed segment ids, next transaction id). */
  def recover(root: Path): (Seq[SegmentId], Long)

  /** Committed segment ids WITHOUT any recovery sweep — the read-only
    * listing for observers (e.g. the streaming source): a reader must never
    * delete a concurrent writer's in-flight `.tmp`/unreferenced segments. */
  def listCommitted(root: Path): Seq[SegmentId]

  /** Delete final-name segment directories not in `keep` (GC for
    * superseded/orphaned segments). Returns directories removed. Rename
    * protocol: no-op (committed == listed, deletion happens at replace). */
  def sweepUnreferenced(root: Path, keep: Seq[SegmentId]): Int = 0

  /** Physically delete a committed segment directory (GC after compact /
    * replace — only call once no live snapshot can reference it). */
  def deleteSegment(root: Path, id: SegmentId): Unit
}

/** On-disk layout, naming, and the two commit protocols.
  *
  * Layout of a table directory:
  * {{{
  *   <root>/schema.json                    table schema (MatSchema JSON)
  *   <root>/<txn%08x>.<seg%08x>/           segment (parquet dir)
  *   <root>/<txn%08x>.<seg%08x>.tmp/       uncommitted segment (rename protocol)
  *   <root>/_log/<version%08x>.json        manifest (manifest protocol only)
  * }}}
  */
object Storage {
  private val Committed: Regex = """^([0-9a-f]{8})\.([0-9a-f]{8})$""".r
  private val Tmp: Regex = """^([0-9a-f]{8})\.([0-9a-f]{8})\.tmp$""".r

  def segmentDirName(id: SegmentId, tmp: Boolean): String =
    f"${id.txnId}%08x.${id.segNum}%08x" + (if (tmp) ".tmp" else "")

  def decode(name: String): Option[(SegmentId, Boolean)] = name match {
    case Committed(t, s) => Some((SegmentId(java.lang.Long.parseLong(t, 16), Integer.parseInt(s, 16)), false))
    case Tmp(t, s)       => Some((SegmentId(java.lang.Long.parseLong(t, 16), Integer.parseInt(s, 16)), true))
    case _               => None
  }

  def schemaPath(root: Path): Path = root.resolve("schema.json")

  // ---- commit wall-clock (TIMESTAMP AS OF) -------------------------------
  //
  // Each transaction's FIRST segment directory carries a `_commit_ts` file
  // (epoch millis), written just before the commit becomes visible — under
  // renames while the directory is still `.tmp`, under the manifest before
  // the manifest publish — so a visible transaction always has its stamp.
  // Underscore-prefixed, so parquet readers and data-file checks ignore it.
  // Readers make the series MONOTONE by running-max over txn order (wall
  // clocks of different writer processes may skew; transaction ids are the
  // authoritative order, timestamps are a resolution aid). The reference
  // has no commit clock (its ids are logical, database.rs:74-79) — this is
  // the minimal metadata TIMESTAMP AS OF needs.

  val CommitTsFile = "_commit_ts"

  /** Stamp `System.currentTimeMillis` into each new transaction's first
    * segment (no-op where a stamp already exists — checkpoint pre-seeds
    * the folded baseline with the horizon txn's ORIGINAL timestamp). */
  private[core] def stampCommitTs(root: Path, proto: Protocol,
      newIds: Seq[SegmentId]): Unit =
    newIds.groupBy(_.txnId).values.map(_.min).foreach { id =>
      val f = proto.writePath(root, id).resolve(CommitTsFile)
      if (!Files.exists(f))
        Files.write(f, String.valueOf(System.currentTimeMillis())
          .getBytes(StandardCharsets.UTF_8))
    }

  /** Per-transaction commit wall-clock (epoch millis) over the given
    * visible segments, monotone by txn order. Transactions predating the
    * stamp (or folded baselines of pre-stamp history) read as 0 — i.e.
    * visible at every timestamp, the only safe reading for old tables. */
  def commitTimestamps(root: Path, proto: Protocol,
      segs: Seq[SegmentId]): Seq[(Long, Long)] = {
    var run = 0L
    segs.groupBy(_.txnId).toSeq.sortBy(_._1).map { case (txn, ids) =>
      val ts = ids.sorted.iterator
        .map(id => proto.readPath(root, id).resolve(CommitTsFile))
        .find(Files.exists(_))
        .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
        .getOrElse(0L)
      run = math.max(run, ts)
      (txn, run)
    }
  }

  def writeSchema(root: Path, schema: MatSchema): Unit = {
    Files.createDirectories(root)
    // write-then-atomic-move: schema.json is also REwritten as the ALTER
    // TABLE read mirror, and a reader must never see a torn document.
    // Writer-unique tmp name: two CAS winners in quick succession both
    // refresh the mirror — a shared tmp would let one writer move the
    // other's file away mid-rewrite (and readers prefer the versioned
    // _schema/ file anyway, so mirror refresh order is harmless).
    val tmp = Files.createTempFile(root, ".schema-mirror-", ".tmp")
    Files.write(tmp, schema.json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, schemaPath(root),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def readSchema(root: Path): MatSchema = readSchemaVersioned(root)._1

  // ---- schema versioning (ALTER TABLE compare-and-set) --------------------
  //
  // `schema.json` alone cannot serialize concurrent ALTERs: an
  // unsynchronized read-modify-write silently loses one of two racing
  // changes (the atomic move only prevents torn READS). Post-alter schemas
  // therefore live as immutable `_schema/<version>.json` documents published
  // with the same put-if-absent primitive as manifest commits
  // (tryWriteManifest's hard-link conditional put): the loser of a race gets
  // `false` back, re-reads, and re-applies its change. `schema.json` stays
  // as a read mirror of the latest version — readers PREFER the versioned
  // file, so a crash between CAS and mirror rewrite is harmless.

  private def schemaVerDir(root: Path): Path = root.resolve("_schema")
  private val SchemaVer: Regex = """^([0-9a-f]{8})\.json$""".r

  private def latestSchemaFile(root: Path): Option[(Path, Long)] =
    listDir(schemaVerDir(root)).flatMap { p =>
      p.getFileName.toString match {
        case SchemaVer(v) => Some((p, java.lang.Long.parseLong(v, 16)))
        case _            => None
      }
    }.sortBy(_._2).lastOption

  /** Current schema + its version (version 0 = the CREATE-time schema.json;
    * the first ALTER publishes version 1). */
  def readSchemaVersioned(root: Path): (MatSchema, Long) =
    latestSchemaFile(root) match {
      case Some((p, v)) =>
        (MatSchema.fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)), v)
      case None =>
        (MatSchema.fromJson(
          new String(Files.readAllBytes(schemaPath(root)), StandardCharsets.UTF_8)), 0L)
    }

  /** Atomic compare-and-set of the table schema: succeeds iff no other
    * writer published since version `expected` was read. On success the
    * mirror `schema.json` is refreshed; on failure the caller must re-read
    * ([[readSchemaVersioned]]) and re-apply its change. */
  def casSchema(root: Path, expected: Long, next: MatSchema): Boolean = {
    val dir = schemaVerDir(root)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".schema-", ".tmp")
    Files.write(tmp, next.json.getBytes(StandardCharsets.UTF_8))
    val won =
      try { Files.createLink(dir.resolve(f"${expected + 1L}%08x.json"), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally { Files.deleteIfExists(tmp); () }
    if (won) writeSchema(root, next)
    won
  }

  /** List a directory, CLOSING the stream (Files.list holds an fd until
    * closed — leaking it on hot paths like commit/stream-planning
    * exhausts file descriptors on long-lived drivers). */
  private[core] def listDir(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }

  private def listEntries(root: Path): Seq[(Path, SegmentId, Boolean)] =
    listDir(root).flatMap { p =>
      decode(p.getFileName.toString).map { case (id, tmp) => (p, id, tmp) }
    }

  // ---- GC grace for possibly-live claims ---------------------------------
  //
  // A segment directory that was NEVER referenced by any manifest is either
  // a crashed writer's orphan or a LIVE concurrent writer's in-flight claim
  // (GraftInsert / the delta write / a mid-flush transaction of another
  // process) — indistinguishable by name. GC paths therefore give such
  // directories a grace window (mtime within `graft.recovery.grace.ms`,
  // default 15 min — same shape as every table format's retention guard
  // against vacuuming a live writer) before sweeping. Directories that WERE
  // referenced by some manifest version are provably superseded commits,
  // never claims, and sweep immediately. Visibility is unaffected either
  // way (it comes from the manifest / the segment-0 rule, never the sweep),
  // and a skipped orphan still burns its txn id. Single-writer tooling
  // (crash harnesses, offline GC) can set the property to 0 for the
  // sweep-everything behavior.
  private[core] def recoveryGraceMs: Long =
    sys.props.get("graft.recovery.grace.ms").map(_.toLong).getOrElse(15L * 60L * 1000L)

  private def withinGrace(p: Path): Boolean =
    try System.currentTimeMillis() -
      Files.getLastModifiedTime(p).toMillis < recoveryGraceMs
    catch { case _: java.io.IOException => true } // unreadable: assume live

  def segmentPath(root: Path, id: SegmentId, tmp: Boolean): Path =
    root.resolve(segmentDirName(id, tmp))

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
      Files.delete(p)
    }

  def rootPath(s: String): Path = Paths.get(s)

  /** Pick the protocol a table on disk uses (`_log/` marks manifest), or the
    * requested one for a fresh table. */
  def detect(root: Path): Protocol =
    if (Files.isDirectory(logDir(root))) ManifestProtocol else RenameProtocol

  def forName(name: String): Protocol = name match {
    case "rename"   => RenameProtocol
    case "manifest" => ManifestProtocol
    case other => throw new IllegalArgumentException(
      s"unknown commit protocol '$other' (expected rename or manifest)")
  }

  // ---- rename protocol --------------------------------------------------

  case object RenameProtocol extends Protocol {
    val name = "rename"

    def writePath(root: Path, id: SegmentId): Path = segmentPath(root, id, tmp = true)
    def readPath(root: Path, id: SegmentId): Path = segmentPath(root, id, tmp = false)

    /** Atomic visibility flip: rename in reverse order so segment 0 — the
      * commit marker — lands last (reference transaction.rs:127-136). */
    def commit(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId]): Seq[SegmentId] = {
      stampCommitTs(root, this, newIds) // into the .tmp dirs, pre-visibility
      newIds.sorted.reverse.foreach { id =>
        Files.move(segmentPath(root, id, tmp = true), segmentPath(root, id, tmp = false))
      }
      visibleAfter
    }

    /** Not atomic under renames (see [[Protocol.replace]]): commit the new
      * segments; the caller deletes the superseded directories right after.
      * The base check happens under the caller's in-process lock (the
      * rename protocol is single-process by design). */
    def replace(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId],
        expectedBase: Seq[SegmentId]): Seq[SegmentId] =
      commit(root, newIds, visibleAfter)

    def discardInFlight(root: Path, id: SegmentId): Unit =
      deleteRecursively(segmentPath(root, id, tmp = true))

    /** Recovery sweep (reference: database.rs:100-127): delete uncommitted
      * `.tmp` segments; drop committed segments of transactions missing their
      * segment 0 (partial commit — the rename protocol guarantees segment 0
      * lands last, so its absence proves the commit never completed). */
    def recover(root: Path): (Seq[SegmentId], Long) = {
      val entries = listEntries(root)
      // .tmp flushes and seg-0-less partials may belong to a LIVE writer
      // mid-commit — grace-guard their deletion (visibility is unaffected:
      // both are excluded from the committed set below regardless)
      entries.filter(_._3).filterNot(e => withinGrace(e._1))
        .foreach(e => deleteRecursively(e._1))
      val committed = entries.filterNot(_._3).map(_._2)
      val complete = committed.groupBy(_.txnId).filter(_._2.exists(_.segNum == 0))
      // crashed and incomplete txns still burn their id (count .tmp too)
      val maxTxn = (entries.map(_._2.txnId) :+ 0L).max
      (complete.values.flatten.toSeq.sorted, maxTxn + 1)
    }

    def deleteSegment(root: Path, id: SegmentId): Unit =
      deleteRecursively(segmentPath(root, id, tmp = false))

    /** Same completeness rule as [[recover]] (txns missing segment 0 never
      * finished their commit), but purely observational. */
    def listCommitted(root: Path): Seq[SegmentId] = {
      val committed = listEntries(root).filterNot(_._3).map(_._2)
      committed.groupBy(_.txnId).filter(_._2.exists(_.segNum == 0))
        .values.flatten.toSeq.sorted
    }
  }

  // ---- manifest protocol --------------------------------------------------

  private def logDir(root: Path): Path = root.resolve("_log")
  private val ManifestName: Regex = """^([0-9a-f]{8})\.json$""".r

  case object ManifestProtocol extends Protocol {
    val name = "manifest"

    // visibility comes from the manifest, so segments go straight to their
    // final names — no rename step to need atomicity from the data store
    def writePath(root: Path, id: SegmentId): Path = segmentPath(root, id, tmp = false)
    def readPath(root: Path, id: SegmentId): Path = segmentPath(root, id, tmp = false)

    /** Optimistic multi-writer append: the target set is recomputed from
      * the ON-DISK manifest (not the caller's possibly-stale view) so a
      * concurrent writer's segments survive; a lost publish race re-reads
      * and retries. Txn-id collisions (two writers allocated the same id —
      * possible when both opened the table at the same version) abort: the
      * colliding directory on disk belongs to the OTHER writer. */
    def commit(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId]): Seq[SegmentId] =
      publish(root, newIds, replaceAll = false, visibleAfter)

    /** Atomic swap to exactly `visibleAfter`; aborts if ANY commit landed
      * since the caller's `expectedBase` snapshot — observed either in the
      * manifest content before publishing or as a lost publish race (see
      * [[Protocol.replace]]). */
    def replace(root: Path, newIds: Seq[SegmentId], visibleAfter: Seq[SegmentId],
        expectedBase: Seq[SegmentId]): Seq[SegmentId] =
      publish(root, newIds, replaceAll = true, visibleAfter, expectedBase)

    private def publish(root: Path, newIds: Seq[SegmentId], replaceAll: Boolean,
        intended: Seq[SegmentId], expectedBase: Seq[SegmentId] = Seq.empty): Seq[SegmentId] = {
      stampCommitTs(root, this, newIds) // dirs are final-named, still invisible
      var tries = 0
      while (tries < 16) {
        val latest = latestManifest(root)
        val current = latest.map(readManifest).getOrElse(Seq.empty)
        val clash = newIds.filter(current.contains)
        if (clash.nonEmpty) throw new java.util.ConcurrentModificationException(
          s"transaction-id collision with an already-committed segment: ${clash.mkString(",")}")
        if (replaceAll && current.sorted != expectedBase.sorted)
          throw new java.util.ConcurrentModificationException(
            "table changed since the replace commit's snapshot (overwrite/compact): " +
              s"expected ${expectedBase.sorted.mkString(",")}, found ${current.sorted.mkString(",")}")
        val version = latest.map(manifestVersion).getOrElse(-1L) + 1L
        val target = if (replaceAll) intended.sorted else (current ++ newIds).sorted
        if (tryWriteManifest(root, version, target)) return target
        // lost the publish race: someone committed between read and write
        if (replaceAll) throw new java.util.ConcurrentModificationException(
          "table changed under a replace commit (overwrite/compact); recompute and retry")
        tries += 1
      }
      throw new IllegalStateException("manifest commit: too many publish races")
    }

    def discardInFlight(root: Path, id: SegmentId): Unit =
      deleteRecursively(segmentPath(root, id, tmp = false))

    /** Visible set = latest manifest. Segment directories not referenced by
      * it are leftovers of crashed or rolled-back transactions — swept here.
      * Next txn id must outrank every id ever seen on disk (committed or
      * orphaned), so crashed transactions still burn their id. */
    def recover(root: Path): (Seq[SegmentId], Long) = {
      Files.createDirectories(logDir(root))
      val committed = latestManifest(root).map(readManifest).getOrElse(Seq.empty)
      val onDisk = listEntries(root)
      val live = committed.toSet
      val refEver = everReferenced(root)
      val maxTxn = ((onDisk.map(_._2.txnId) ++ committed.map(_.txnId)) :+ 0L).max
      // superseded commits (referenced by SOME manifest version) sweep
      // immediately; never-referenced dirs may be a live writer's claim —
      // grace-guarded (see Storage.recoveryGraceMs)
      onDisk.filterNot(e => live.contains(e._2))
        .filter(e => refEver.contains(e._2) || !withinGrace(e._1))
        .foreach(e => deleteRecursively(e._1))
      (committed.sorted, maxTxn + 1)
    }

    def deleteSegment(root: Path, id: SegmentId): Unit =
      deleteRecursively(segmentPath(root, id, tmp = false))

    def listCommitted(root: Path): Seq[SegmentId] =
      latestManifest(root).map(readManifest).getOrElse(Seq.empty).sorted

    override def sweepUnreferenced(root: Path, keep: Seq[SegmentId]): Int = {
      val keepSet = keep.toSet
      val refEver = everReferenced(root)
      val stale = listEntries(root).filter(e => !e._3 && !keepSet.contains(e._2))
        .filter(e => refEver.contains(e._2) || !withinGrace(e._1))
      stale.foreach(e => deleteRecursively(e._1))
      stale.size
    }

    /** Every segment id any manifest version has EVER referenced — the
      * provably-not-a-live-claim set (O(manifest versions), metadata). */
    private def everReferenced(root: Path): Set[SegmentId] =
      listDir(logDir(root))
        .filter(p => ManifestName.matches(p.getFileName.toString))
        .flatMap(readManifest).toSet

    private def latestManifest(root: Path): Option[Path] =
      listDir(logDir(root))
        .filter(p => ManifestName.matches(p.getFileName.toString))
        .sortBy(_.getFileName.toString).lastOption

    private def manifestVersion(p: Path): Long = p.getFileName.toString match {
      case ManifestName(v) => java.lang.Long.parseLong(v, 16)
      case _               => 0L
    }

    /** One JSON line per segment keeps parsing dependency-free (the schema
      * document already uses the same hand-rolled style). */
    private def readManifest(p: Path): Seq[SegmentId] = {
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      """\[\s*(\d+)\s*,\s*(\d+)\s*\]""".r.findAllMatchIn(text)
        .map(m => SegmentId(m.group(1).toLong, m.group(2).toInt)).toSeq
    }

    /** Single-file atomic PUT-IF-ABSENT of manifest `<version>.json`:
      * write a temp file, then `Files.createLink` it into place — hard-link
      * creation fails atomically if the target exists, which is the
      * optimistic-concurrency check a second writer must lose. (A
      * `Files.move(ATOMIC_MOVE)` is NOT that check: POSIX rename silently
      * REPLACES an existing target, which would drop the winner's commit.
      * On an object store the equivalent is a conditional put.) Returns
      * false when the version was already taken. */
    private[core] def tryWriteManifest(root: Path, version: Long,
        visible: Seq[SegmentId]): Boolean = {
      val dir = logDir(root)
      Files.createDirectories(dir)
      val body = visible.sorted.map(s => s"  [${s.txnId}, ${s.segNum}]").mkString(
        "{\"segments\": [\n", ",\n", "\n]}\n")
      val tmp = Files.createTempFile(dir, ".manifest-", ".tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        Files.createLink(dir.resolve(f"$version%08x.json"), tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally Files.delete(tmp)
    }
  }
}
