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
  *   - events.ts is normalized to an epoch-nano LONG whatever the fixture's
  *     physical parquet type: TIMESTAMP(NANOS) is read via
  *     spark.sql.legacy.parquet.nanosAsLong=true (arrives as LongType and
  *     passes through); timestamp[us] / TIMESTAMP_NTZ arrives as a timestamp
  *     and is cast via unix_micros under the UTC session timezone. The DuckDB
  *     oracles use epoch_ns(ts), which is correct for both physical types.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** One battery entry: Spark query + optional DuckDB oracle SQL. */
  final case class Entry(name: String, oracle: Option[String])(val fn: QueryFn)

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df // TIMESTAMP(NANOS) fixture
        case org.apache.spark.sql.types.TimestampNTZType =>
          // TIMESTAMP_NTZ fixture: the walltime IS the UTC instant. Pure
          // NTZ-to-NTZ datetime arithmetic — no cast through TIMESTAMP, so
          // the session timezone can never reinterpret the walltime (a
          // non-UTC session used to shift instants here silently).
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000L"))
        case _ =>
          // TIMESTAMP (instant-typed) fixture: unix_micros reads the
          // instant directly — session-timezone-independent by definition.
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000L"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register the named tables as temp views and run Spark SQL — used where
    * SQL is the clearest Spark-first expression (subqueries, ASOF rewrites). */
  def sql(spark: SparkSession, dir: String, tables: Seq[String], query: String): DataFrame = {
    tables.foreach(t => table(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(query)
  }

  /** Per-process root for oracle FIXTURES (q76/q77/q78/q90/q92/q93/q96):
    * the Spark query writes them and the DuckDB oracle reads them back, so
    * the path is interpolated into both at battery-construction time — it
    * must be stable within a run but unique across runs, or concurrent
    * verify/bench/test JVMs clobber each other's fixtures mid-query. */
  private val fixtureRoot: java.nio.file.Path = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"),
    s"graft-run-${ProcessHandle.current().pid()}")
  def fixture(name: String): java.nio.file.Path = fixtureRoot.resolve(name)

  /** Fan a below-parallelism scan out to every core BEFORE heavy per-row
    * compute (image decode, regex kernels, shingling): a small parquet
    * file is one row group = ONE split, so the map stage otherwise
    * serializes on a single task no matter the core count — byte-range
    * splitting cannot parallelize inside a row group. Conditional, so at
    * scale (input splits >= parallelism) it is an exact no-op and the
    * payload is never shuffled; below it, the one-time shuffle of the
    * small input is repaid by the per-row work it spreads out. */
  def fanOut(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def dbl(c: Column): Column = c.cast("double")
  def big(c: Column): Column = c.cast("long")
}
