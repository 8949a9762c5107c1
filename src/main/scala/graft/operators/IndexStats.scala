package graft.operators

/** Drift-stats log for persisted ANN index layouts ([[IvfIndex]],
  * [[PqIndex]]): one JSON line per event in `<index>/stats.jsonl` —
  * `train` (rebuild baseline) and `maintain` (per maintenance fold) rows
  * carrying the mean assigned-centroid squared distance of the vectors
  * processed. The log is the operator's re-train advisory: centroids are
  * FIXED by design (Faiss add/remove semantics — maintenance preserves
  * search geometry exactly), so nothing else in the system says when the
  * data has drifted away from them; a maintain/train mean ratio well
  * above 1 is that signal, measured against actual recall degradation by
  * tools.DriftProbe.
  *
  * Driver-side file appends (single index writer, like the layout
  * itself): no Spark jobs, so recording costs nothing on the maintenance
  * path beyond one tiny aggregate over the already-persisted delta. */
object IndexStats {

  final case class Row(seq: Long, phase: String, n: Long, meanSqdist: Double)

  private def file(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "stats.jsonl")

  /** Start a fresh log (writeIndex = a rebuild: old drift history is
    * about the OLD centroids and would poison the new baseline). */
  def reset(path: String): Unit = {
    java.nio.file.Files.deleteIfExists(file(path))
    ()
  }

  /** Record an observed (count, mean) pair — the zero-extra-job path:
    * the [[org.apache.spark.sql.Observation]] was attached to the
    * assignment plan and its metrics rode the layout's own first action.
    * An empty batch (n = 0) says nothing about drift and is skipped. */
  def record(path: String, phase: String,
      obs: org.apache.spark.sql.Observation): Unit = {
    val m = obs.get
    val n = m.get("n").collect { case l: Long => l }.getOrElse(0L)
    val mean = m.get("m").collect { case d: Double => d }
    if (n > 0L) mean.foreach(append(path, phase, n, _))
  }

  def append(path: String, phase: String, n: Long, meanSqdist: Double): Unit = {
    val f = file(path)
    java.nio.file.Files.createDirectories(f.getParent)
    val seq = read(path).lastOption.map(_.seq + 1).getOrElse(0L)
    val line = s"""{"seq":$seq,"phase":"$phase","n":$n,"mean_sqdist":$meanSqdist}\n"""
    java.nio.file.Files.write(f, line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  def read(path: String): Seq[Row] = {
    val f = file(path)
    if (!java.nio.file.Files.exists(f)) return Seq.empty
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(f).asScala.toSeq
      .filter(_.nonEmpty).flatMap(parse)
  }

  // the log is machine-written with exactly these four fields — a tiny
  // regex parse keeps this file dependency-free (no JSON lib in scope)
  private val Line =
    """\{"seq":(\d+),"phase":"(\w+)","n":(\d+),"mean_sqdist":([-0-9.eE]+|NaN)\}""".r

  private def parse(s: String): Option[Row] = s.trim match {
    case Line(seq, phase, n, m) =>
      Some(Row(seq.toLong, phase, n.toLong, m.toDouble))
    case _ => None
  }
}
