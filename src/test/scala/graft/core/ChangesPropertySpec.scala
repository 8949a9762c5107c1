package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the CDC algebra: random transaction histories —
  * upserts, deletes, TRUNCATEs, INSERT OVERWRITEs, checkpoints — and for
  * EVERY (from, to) window, `changesBetween` must equal the brute-force
  * diff of a driver-side model (live state after each txn tracked as a
  * plain Map). The replace guard's whole decision tree is exercised by
  * construction: windows fully above/below/straddling replaces, fold
  * boundaries at/inside/below windows, silent same-value rewrites, and
  * insert+delete-within-window cancellation. After a vacuum, every window
  * must still answer EXACTLY or refuse loudly — never a silent wrong
  * delta. Deterministic seeds — failures replay. */
class ChangesPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(Seq(Dimension("k", 10)), Seq(ValueCol("v")))

  private def batch(rows: Seq[(Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), st)
  }

  private def keys(ks: Seq[Long]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(ks.map(Row(_)), 2),
      StructType(Seq(StructField("k", LongType))))
  }

  /** Expected minimal I/U/D delta between two model states. */
  private def modelDiff(oldS: Map[Long, Long], newS: Map[Long, Long])
      : Set[(String, Long, Option[Long])] = {
    val i = (newS.keySet -- oldS.keySet).map(k => ("I", k, Some(newS(k))))
    val d = (oldS.keySet -- newS.keySet).map(k => ("D", k, None: Option[Long]))
    val u = (oldS.keySet & newS.keySet).filter(k => oldS(k) != newS(k))
      .map(k => ("U", k, Some(newS(k))))
    (i ++ d ++ u).toSet
  }

  private def observed(db: MatDb, from: Long, to: Long)
      : Set[(String, Long, Option[Long])] =
    db.changesBetween(from, to).collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("changesBetween equals the model diff over random replace-laden histories") {
    for (seed <- Seq(11, 23, 47, 71)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-chprop-$seed")
      val db = MatDb.create(spark, schema, dir.toString, "manifest")
      // states(t) = live state after txn t; states(0) = empty. Checkpoints
      // burn no txn id, so they append no state.
      var states = Vector(Map.empty[Long, Long])
      val nOps = 9
      (1 to nOps).foreach { _ =>
        val cur = states.last
        rnd.nextInt(10) match {
          case 0 => // TRUNCATE (segment-less replace)
            db.overwrite(batch(Nil))
            states :+= Map.empty[Long, Long]
          case 1 => // INSERT OVERWRITE with fresh content
            val rows = (0 until 1 + rnd.nextInt(5))
              .map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(5).toLong))
              .distinctBy(_._1)
            db.overwrite(batch(rows))
            states :+= rows.toMap
          case 2 if states.size > 3 => // checkpoint a strict prefix
            val horizon = 1L + rnd.nextInt(states.size - 3)
            db.checkpoint(horizon) // -1 when nothing old enough: harmless
            () // no state: a fold reshapes history, it changes NO answer
          case _ => // plain upsert/delete txn (never empty: must burn a txn)
            var ups: Seq[(Long, Long)] = (0 until rnd.nextInt(4))
              .map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(5).toLong))
              .distinctBy(_._1)
            val dels = (0 until rnd.nextInt(3))
              .map(_ => rnd.nextInt(12).toLong).distinct
              .filterNot(ups.map(_._1).contains)
            if (ups.isEmpty && dels.isEmpty)
              ups = Seq((rnd.nextInt(12).toLong, rnd.nextInt(5).toLong))
            val t = db.newTransaction()
            if (ups.nonEmpty) t.addRows(batch(ups))
            if (dels.nonEmpty) t.deleteRows(keys(dels))
            t.commit()
            states :+= (cur ++ ups.toMap) -- dels
        }
        assert(db.txnWatermark === states.size - 1L,
          s"seed $seed: model out of sync with the txn clock")
      }
      val top = db.txnWatermark
      for (from <- 0L to top; to <- from to top) {
        val want = modelDiff(states(from.toInt), states(to.toInt))
        val got = observed(db, from, to)
        assert(got === want, s"seed $seed window ($from, $to]: got $got want $want")
      }
      // after vacuum, every window still answers EXACTLY or refuses loudly
      // (never a silent wrong delta); the streaming tail window — from the
      // watermark — must always keep answering
      db.vacuum()
      var answered = 0
      for (from <- 0L to top; to <- from to top) {
        val want = modelDiff(states(from.toInt), states(to.toInt))
        try {
          assert(observed(db, from, to) === want,
            s"seed $seed post-vacuum window ($from, $to] answered wrong")
          answered += 1
        } catch {
          case e: IllegalStateException =>
            assert(e.getMessage.contains("replace-kind commit"),
              s"seed $seed post-vacuum ($from, $to]: unexpected refusal $e")
        }
      }
      assert(answered > 0, s"seed $seed: post-vacuum everything refused")
      assert(observed(db, top, top) === Set.empty,
        s"seed $seed: the streaming tail window must answer after vacuum")
    }
  }
}
