package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Shared plumbing for the correctness battery.
  *
  * Cross-engine determinism rules (Spark result must hash-match the DuckDB
  * oracle):
  *   - Never aggregate raw doubles: cast to DECIMAL before SUM (exact
  *     arithmetic in both engines), cast the exact result back to DOUBLE.
  *     Averages = CAST(decimal_sum AS DOUBLE) / count (double division of
  *     identical operands is IEEE-identical).
  *   - Per-row double arithmetic (+,-,*,/, sqrt) is IEEE-deterministic and
  *     safe; transcendentals (log, exp, pow) are libm-dependent — avoided.
  *   - Derived integers are cast to BIGINT on both sides (Spark year() is
  *     INT, DuckDB year() is BIGINT, etc.).
  *   - Every query ends in a deterministic ORDER BY on a unique key set, and
  *     nullable sort keys say NULLS FIRST explicitly (DuckDB defaults to
  *     NULLS LAST, Spark to NULLS FIRST).
  *   - events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses; we read
  *     it with spark.sql.legacy.parquet.nanosAsLong=true (epoch-nano LONG)
  *     and the oracles use epoch_ns(ts).
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** One battery entry: Spark query + optional DuckDB oracle SQL. */
  final case class Entry(name: String, oracle: Option[String])(val fn: QueryFn)

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register the named tables as temp views and run Spark SQL — used where
    * SQL is the clearest Spark-first expression (subqueries, ASOF rewrites). */
  def sql(spark: SparkSession, dir: String, tables: Seq[String], query: String): DataFrame = {
    tables.foreach(t => table(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(query)
  }

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def dbl(c: Column): Column = c.cast("double")
  def big(c: Column): Column = c.cast("long")
}
