package graft.core

import java.nio.file.{Files, Path, Paths}
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

/** On-disk layout and the commit/recovery protocol.
  *
  * Layout of a table directory:
  * {{{
  *   <root>/schema.json                    table schema (MatSchema JSON)
  *   <root>/<txn%08x>.<seg%08x>/           committed segment (parquet dir)
  *   <root>/<txn%08x>.<seg%08x>.tmp/       uncommitted segment
  * }}}
  *
  * Naming mirrors the reference (storage.rs:86-111). Commit renames
  * `.tmp` directories to their visible names in *reverse* segment order so
  * that segment 0 — the commit marker — appears last
  * (reference: transaction.rs:127-136, segment.rs:195-200). Recovery on open
  * deletes `.tmp` leftovers and ignores transactions whose segment 0 is
  * missing (fixing the reference's acknowledged gap, database.rs:121 TODO).
  *
  * Local-FS rename is atomic, matching the reference's assumption. For
  * object stores (no atomic rename) the same interface would be backed by a
  * manifest commit — see SURVEY.md §7.4; out of scope for local mode.
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

  def writeSchema(root: Path, schema: MatSchema): Unit = {
    Files.createDirectories(root)
    Files.write(schemaPath(root), schema.json.getBytes(StandardCharsets.UTF_8))
  }

  def readSchema(root: Path): MatSchema =
    MatSchema.fromJson(new String(Files.readAllBytes(schemaPath(root)), StandardCharsets.UTF_8))

  private def listEntries(root: Path): Seq[(Path, SegmentId, Boolean)] =
    if (!Files.isDirectory(root)) Seq.empty
    else Files.list(root).iterator().asScala.toSeq.flatMap { p =>
      decode(p.getFileName.toString).map { case (id, tmp) => (p, id, tmp) }
    }

  /** Recovery sweep (reference: database.rs:100-127): delete uncommitted
    * `.tmp` segments; drop committed segments of transactions missing their
    * segment 0 (partial commit — the rename protocol guarantees segment 0
    * lands last, so its absence proves the commit never completed).
    * Returns (committed segment ids, next transaction id). */
  def recover(root: Path): (Seq[SegmentId], Long) = {
    val entries = listEntries(root)
    entries.filter(_._3).foreach(e => deleteRecursively(e._1))
    val committed = entries.filterNot(_._3).map(_._2)
    val complete = committed.groupBy(_.txnId).filter(_._2.exists(_.segNum == 0))
    complete.values.flatten.toSeq.sorted match {
      case segs =>
        val maxTxn = (committed.map(_.txnId) :+ 0L).max // incomplete txns still burn their id
        (segs, maxTxn + 1)
    }
  }

  def segmentPath(root: Path, id: SegmentId, tmp: Boolean): Path =
    root.resolve(segmentDirName(id, tmp))

  /** Atomic visibility flip: rename in reverse order so segment 0 is last. */
  def commitSegments(root: Path, ids: Seq[SegmentId]): Unit =
    ids.sorted.reverse.foreach { id =>
      Files.move(segmentPath(root, id, tmp = true), segmentPath(root, id, tmp = false))
    }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
      Files.delete(p)
    }

  def delete(root: Path, id: SegmentId, tmp: Boolean): Unit =
    deleteRecursively(segmentPath(root, id, tmp))

  def rootPath(s: String): Path = Paths.get(s)
}
