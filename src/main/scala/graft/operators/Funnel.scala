package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how deep into a step sequence (view → click →
  * purchase, …) each user gets, where step i+1 only counts if it happens
  * STRICTLY AFTER the user's earliest qualifying step i — the classic
  * conversion funnel with ordering semantics, not mere set membership.
  *
  * Shape: chained whole-partition window minima —
  * `t_{i+1} = min(ts WHERE type = step_{i+1} AND ts > t_i) OVER (PARTITION
  * BY user)`. Unbounded partition windows need NO sort, every chained pass
  * reuses the same hash partitioning, and the final per-user reduction
  * also reuses it — the entire k-step funnel costs ONE exchange on the
  * user column regardless of k or data volume (PlanSpec-checkable), where
  * the textbook k-way self-join form costs k shuffles of the event table.
  */
object Funnel {

  /** Per-user funnel depth: (userCol, depth BIGINT), depth = number of
    * steps completed in strict order (0 = not even step 1). `tsCol` must
    * be a totally-ordered column (epoch numeric or timestamp); ties
    * between consecutive steps do NOT advance the funnel (strictly
    * after).
    *
    * `maxGap`: optional CONVERSION WINDOW — step i+1 only counts if it
    * happens within `maxGap` of the user's step-i time
    * (`t_i < ts_{i+1} <= t_i + maxGap`), the form real funnel analyses
    * use ("purchased within 7 days of the click"). Requires a NUMERIC
    * `tsCol` (epoch seconds/millis — `maxGap` is in the same unit; cast
    * timestamps upstream). The window is one more predicate inside the
    * same chained `when`, so the one-exchange shape is unchanged.
    *
    * Note the chain keeps each step's EARLIEST qualifying time: with a
    * window this is the standard greedy funnel — a later step-i event
    * that would open a different window does not restart the chain. */
  def depths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    maxGap.foreach { g =>
      require(g > 0, s"maxGap must be positive: $g")
      require(events.schema(tsCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"maxGap needs a numeric $tsCol (epoch units); cast timestamps upstream")
    }
    val w = Window.partitionBy(col(userCol))
    val chained = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else {
          val inOrder = col(typeCol) === step && col(s"_t$i").isNotNull &&
            col(tsCol) > col(s"_t$i")
          maxGap.fold(inOrder)(g => inOrder && col(tsCol) <= col(s"_t$i") + lit(g))
        }
      df.withColumn(s"_t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    var depth: Column = lit(0L)
    for (i <- 1 to steps.size)
      depth = when(col(s"_t$i").isNotNull, lit(i.toLong)).otherwise(depth)
    chained.groupBy(col(userCol)).agg(max(depth).as("depth"))
  }

  /** Funnel report: one row per depth 0..k with the user count. */
  def report(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGap: Option[Long] = None): DataFrame =
    depths(events, userCol, typeCol, tsCol, steps, maxGap)
      .groupBy(col("depth")).agg(count(lit(1)).as("users"))
      .orderBy(col("depth"))
}
