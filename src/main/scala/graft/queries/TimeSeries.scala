package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Time-series battery entries (round 13): the reference is a sensor-log
  * timeseries store (/root/reference/README.md:3-8), so the regularization
  * operations every sensor pipeline needs — resample + gap-fill onto a
  * fixed grid, interval containment joins, and OHLC-style downsampling —
  * are first-class here, each with a DuckDB oracle replaying the exact
  * formulation.
  *
  * Determinism notes (Q.scala rules): events.ts arrives as epoch-nano
  * LONG on the Spark side and `epoch_ns(ts)` on the oracle side; cell
  * averages go through exact DECIMAL sums; interpolation keeps one fixed
  * operand order so double arithmetic is IEEE-identical across engines.
  */
object TimeSeries {

  private val H6 = 21600000000000L  // 6 hours in nanos
  private val M30 = 1800000000000L  // 30 minutes in nanos
  private val DAY = 86400000000000L // 1 day in nanos

  val entries: Seq[Entry] = Seq(

    // ---------------------------------------------------------------- q144
    // Resample each user's event series onto a 6-hour grid: exact-decimal
    // cell averages, forward fill, linear interpolation of interior gaps.
    // Spark-first: operators.GapFill — one (key,cell) hash aggregate, a
    // distributed sequence-explode grid (O(output), never driver-side),
    // per-key windows; the fill uses the ANSI cumulative-count run trick so
    // the oracle replays it verbatim.
    Entry("q144_gapfill_resample", Some(
      s"""WITH obs AS (
         |  SELECT user_id, epoch_ns(ts) // $H6 AS cell,
         |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
         |           / COUNT(value) AS v
         |  FROM events GROUP BY 1, 2
         |), span AS (
         |  SELECT user_id, MIN(cell) AS lo, MAX(cell) AS hi FROM obs GROUP BY 1
         |), grid AS (
         |  SELECT user_id, UNNEST(range(lo, hi + 1)) AS cell FROM span
         |), j AS (
         |  SELECT g.user_id, g.cell, o.v
         |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.cell = o.cell
         |), m AS (
         |  SELECT *,
         |    COUNT(v) OVER (PARTITION BY user_id ORDER BY cell
         |                   ROWS UNBOUNDED PRECEDING) AS gf,
         |    COUNT(v) OVER (PARTITION BY user_id ORDER BY cell DESC
         |                   ROWS UNBOUNDED PRECEDING) AS gb
         |  FROM j
         |), f AS (
         |  SELECT *,
         |    MAX(v) OVER (PARTITION BY user_id, gf) AS ff,
         |    MAX(CASE WHEN v IS NOT NULL THEN cell END)
         |      OVER (PARTITION BY user_id, gf) AS fc,
         |    MAX(v) OVER (PARTITION BY user_id, gb) AS nx,
         |    MAX(CASE WHEN v IS NOT NULL THEN cell END)
         |      OVER (PARTITION BY user_id, gb) AS nc
         |  FROM m
         |)
         |SELECT user_id, cell * $H6 AS cell_ts,
         |       CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
         |       ff AS val_ff,
         |       CASE WHEN v IS NOT NULL THEN v
         |            WHEN ff IS NOT NULL AND nx IS NOT NULL THEN
         |              ff + (nx - ff) * CAST(cell - fc AS DOUBLE)
         |                             / CAST(nc - fc AS DOUBLE)
         |       END AS val_lerp
         |FROM f ORDER BY user_id, cell_ts""".stripMargin)) { (s, d) =>
      val ev = table(s, d, "events")
      graft.operators.GapFill.resample(
        ev.select(col("user_id"), col("ts"), col("value")),
        keys = Seq("user_id"), tsCol = "ts", grain = H6,
        cellAgg = sum(dec4(col("value"))).cast("double") / count(col("value")),
        interpolate = true)
        .orderBy(col("user_id"), col("cell_ts"))
    },

    // ---------------------------------------------------------------- q145
    // Interval containment WITHOUT an equi-key: clicks landing in the
    // 30-minute window after each sampled purchase, aggregated per
    // purchase. Spark-first: operators.RangeJoin bucketizes both sides to
    // 30-minute cells (points once, intervals to each overlapped cell) so
    // the theta join becomes ONE shuffled equi-join — Spark's own plan for
    // this predicate is BroadcastNestedLoopJoin, O(points × intervals).
    // The oracle checks with DuckDB's native inequality (IE) join.
    Entry("q145_interval_range_join", Some(
      s"""WITH p AS (
         |  SELECT event_id AS purchase_id, user_id AS p_user,
         |         epoch_ns(ts) AS lo, epoch_ns(ts) + $M30 AS hi
         |  FROM events WHERE event_type = 'purchase' AND user_id % 5 = 0
         |), c AS (
         |  SELECT epoch_ns(ts) AS click_ts, value AS click_value
         |  FROM events WHERE event_type = 'click'
         |)
         |SELECT purchase_id, p_user,
         |       COUNT(*) AS n_clicks,
         |       CAST(SUM(CAST(click_value AS DECIMAL(18,2))) AS DOUBLE)
         |         AS click_value_sum
         |FROM p JOIN c ON click_ts >= lo AND click_ts <= hi
         |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin)) { (s, d) =>
      val ev = table(s, d, "events")
      val purchases = ev
        .where(col("event_type") === "purchase" && col("user_id") % 5 === 0)
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("lo"), (col("ts") + M30).as("hi"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("ts").as("click_ts"), col("value").as("click_value"))
      graft.operators.RangeJoin
        .pointInInterval(clicks, "click_ts", purchases, "lo", "hi", bucket = M30)
        .groupBy(col("purchase_id"), col("p_user"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(dec2(col("click_value"))).cast("double").as("click_value_sum"))
        .orderBy(col("purchase_id"))
    },

    // ---------------------------------------------------------------- q146
    // OHLC downsample: per user per day — open/close by (ts, event_id)
    // order (unique tiebreak), high/low/count over the cell. One window
    // pass + one hash aggregate, both on the same (user, day) grain; ties
    // cannot make it nondeterministic because event_id is unique.
    Entry("q146_ohlc_downsample", Some(
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // $DAY AS cell,
         |         epoch_ns(ts) AS tn, event_id, value
         |  FROM events
         |), r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY user_id, cell
         |                       ORDER BY tn, event_id) AS ra,
         |    ROW_NUMBER() OVER (PARTITION BY user_id, cell
         |                       ORDER BY tn DESC, event_id DESC) AS rd
         |  FROM e
         |)
         |SELECT user_id, cell * $DAY AS day_ts,
         |       MAX(CASE WHEN ra = 1 THEN value END) AS open,
         |       MAX(value) AS high, MIN(value) AS low,
         |       MAX(CASE WHEN rd = 1 THEN value END) AS close,
         |       COUNT(value) AS n_obs
         |FROM r GROUP BY 1, 2 ORDER BY user_id, day_ts""".stripMargin)) { (s, d) =>
      val cell = graft.core.MatSchema.chunkKeyCol(col("ts"), DAY)
      val e = table(s, d, "events")
        .select(col("user_id"), cell.as("cell"), col("ts"), col("event_id"),
          col("value"))
      val byCell = Window.partitionBy(col("user_id"), col("cell"))
      val r = e
        .withColumn("ra", row_number().over(
          byCell.orderBy(col("ts"), col("event_id"))))
        .withColumn("rd", row_number().over(
          byCell.orderBy(col("ts").desc, col("event_id").desc)))
      r.groupBy(col("user_id"), col("cell"))
        .agg(
          max(when(col("ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(col("value")).as("n_obs"))
        .select(col("user_id"), (col("cell") * DAY).as("day_ts"),
          col("open"), col("high"), col("low"), col("close"), col("n_obs"))
        .orderBy(col("user_id"), col("day_ts"))
    },

    // ---------------------------------------------------------------- q148
    // Interval OVERLAP (interval × interval, round 14): maintenance
    // windows (around sampled purchases, lengths spanning 5 doubling
    // classes — 30 min to 8 h) × outage windows (2 h after each sampled
    // error). Spark-first: operators.RangeJoin.intervalOverlapMultiRes —
    // the left side partitions into doubling length classes (≤ 2 bucket
    // replicas each), the right replicates per class, and each
    // overlapping pair is emitted ONCE by the bucket owning the
    // intersection's start (max(lo₁,lo₂) lies in both intervals), so
    // there is no post-dedup. Spark's own plan for this predicate is a
    // BroadcastNestedLoopJoin over the cross product. The oracle checks
    // with DuckDB's native inequality (IE) join; overlap durations are
    // exact LONG arithmetic.
    Entry("q148_interval_overlap_join", Some(
      s"""WITH m AS (
         |  SELECT event_id AS maint_id,
         |         epoch_ns(ts) AS mlo,
         |         epoch_ns(ts) + $M30 * (1 << (user_id % 5)) AS mhi
         |  FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0
         |), o AS (
         |  SELECT event_id AS outage_id,
         |         epoch_ns(ts) AS olo, epoch_ns(ts) + ${H6 / 3} AS ohi
         |  FROM events WHERE event_type = 'error' AND user_id % 4 = 0
         |)
         |SELECT maint_id,
         |       COUNT(*) AS n_outages,
         |       CAST(SUM(LEAST(mhi, ohi) - GREATEST(mlo, olo)) AS BIGINT)
         |         AS overlap_ns,
         |       MIN(outage_id) AS first_outage
         |FROM m JOIN o ON mlo <= ohi AND olo <= mhi
         |GROUP BY 1 ORDER BY maint_id""".stripMargin)) { (s, d) =>
      val ev = table(s, d, "events")
      val maint = ev
        .where(col("event_type") === "purchase" && col("user_id") % 3 === 0)
        .select(col("event_id").as("maint_id"), col("ts").as("mlo"),
          (col("ts") + lit(M30) *
            expr("shiftleft(1L, cast(user_id % 5 as int))")).as("mhi"))
      val outages = ev
        .where(col("event_type") === "error" && col("user_id") % 4 === 0)
        .select(col("event_id").as("outage_id"), col("ts").as("olo"),
          (col("ts") + H6 / 3).as("ohi"))
      graft.operators.RangeJoin
        .intervalOverlapMultiRes(maint, "mlo", "mhi", outages, "olo", "ohi",
          base = M30)
        .groupBy(col("maint_id"))
        .agg(count(lit(1)).as("n_outages"),
          sum(least(col("mhi"), col("ohi")) - greatest(col("mlo"), col("olo")))
            .as("overlap_ns"),
          min(col("outage_id")).as("first_outage"))
        .orderBy(col("maint_id"))
    }
  )
}
