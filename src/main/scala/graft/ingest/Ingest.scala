package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File ingestion with the reference example's semantics
  * (reference: examples/sensor-log.rs), Spark-first:
  *
  *   - glob + gzip + parallel parse are native to `spark.read.csv`
  *     (sensor-log.rs:220-233 expands globs and decompresses by hand,
  *     fanning out N-1 parser threads, sensor-log.rs:241-305 — all of that
  *     disappears into the file source's split planning);
  *   - `%d/%m/%Y %I:%M:%S %p` timestamps with `a.m.`/`p.m.` markers
  *     normalized then parsed (sensor-log.rs:123-128);
  *   - float readings stored as x1000 fixed-point longs (sensor-log.rs:130-136);
  *   - malformed lines preserved, not crashed on (PERMISSIVE + corrupt-record
  *     column; sensor-log.rs:137-175 skips with a message).
  */
object Ingest {

  /** Raw sensor-log TSV schema: timestamp, component, sensor, kind, value. */
  val sensorLogSchema: StructType = StructType(Seq(
    StructField("ts_raw", StringType),
    StructField("component", StringType),
    StructField("sensor", StringType),
    StructField("kind", StringType),
    StructField("value_raw", StringType),
    StructField("_corrupt", StringType)))

  /** Read TSV files (plain or .gz, glob patterns OK) permissively. */
  def readSensorLog(spark: SparkSession, pattern: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(sensorLogSchema)
      .csv(pattern)

  /** `31/12/1995 11:59:59 p.m.` -> timestamp. Normalizes the reference's
    * `a.m.`/`p.m.` markers to parseable AM/PM (sensor-log.rs:124-125).
    * try_to_timestamp: malformed rows yield NULL instead of failing the job
    * under ANSI mode (the reference skips bad lines, sensor-log.rs:137-175). */
  def parseSensorTimestamp(c: Column): Column =
    try_to_timestamp(
      regexp_replace(regexp_replace(c, "[aA]\\.[mM]\\.", "AM"), "[pP]\\.[mM]\\.", "PM"),
      lit("d/M/yyyy h:mm:ss a"))

  /** Fixed-point encode: double -> x10^scale long (sensor-log.rs:130-136). */
  def fixedPoint(c: Column, scale: Int = 3): Column =
    round(c * math.pow(10, scale)).cast("long")

  /** Parsed + coerced sensor rows: (ts_millis, component, sensor, kind,
    * value_mils) with malformed lines dropped into the returned `bad` count
    * rather than failing the job. */
  def parseSensorLog(raw: DataFrame): DataFrame =
    raw.where(col("_corrupt").isNull)
      .select(
        unix_millis(parseSensorTimestamp(col("ts_raw"))).as("time"),
        col("component"), col("sensor"), col("kind"),
        fixedPoint(expr("try_cast(value_raw AS DOUBLE)")).as("value"))
      .where(col("time").isNotNull && col("value").isNotNull)

  /** Dense ranks 1..N by key order over a DISTINCT-key DataFrame WITHOUT a
    * single-partition window — the scale-safe replacement for
    * `dense_rank().over(Window.orderBy(keys))`, whose empty `partitionBy`
    * funnels every row through one task (exactly what breaks for
    * LLM-pipeline vocabularies: URLs, n-grams, user ids at 100 TB).
    *
    * Plan: range-repartition by the keys (a parallel global sort — partition
    * p's keys all precede partition p+1's), `row_number` within each physical
    * partition, then add per-partition offsets computed with a broadcast
    * triangular join over the TINY per-partition histogram (<= shuffle
    * partitions rows — cluster-sized, not data-sized; no SinglePartition
    * exchange anywhere). The resulting id is the global rank of the key, a
    * pure function of the data: invariant to where the sampled range
    * boundaries happen to land. */
  def denseRankIds(distinctKeys: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val keys = keyCols.map(col)
    // materialize the distinct key set first: the range partitioner's
    // sampling pass and the ranked materialization below would otherwise
    // each re-execute the full distinct subtree (scan + shuffle); after
    // this, both read dictionary-sized cached blocks
    val dk = distinctKeys.localCheckpoint()
    val ranged = dk.repartitionByRange(keys.map(_.asc): _*)
      .withColumn("_pid", spark_partition_id().cast("long"))
    // materialize ONCE (eager local checkpoint): the per-partition counts
    // and the final id join must observe the SAME physical partitioning —
    // range boundaries come from sampling, and two executions of the
    // subtree are not guaranteed identical boundaries (exchange reuse is
    // an optimization, not a contract). Input is the DISTINCT key set, so
    // the materialized blocks are dictionary-sized, not data-sized.
    val snap = ranged.withColumn("_rn",
        row_number().over(Window.partitionBy(col("_pid")).orderBy(keys: _*)).cast("long"))
      .localCheckpoint()
    val counts = snap.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._n")), lit(0L)).as("_off"))
    snap.join(broadcast(offsets), "_pid")
      .select(keys :+ (col("_off") + col("_rn")).as(idCol): _*)
  }

  /** Dictionary get-or-create (reference sensor-log.rs:27-105: hand-rolled
    * hash-map id assignment persisted to sensors.json).
    *
    * Spark-first: the dictionary is itself a table. New keys get
    * `max(existing_id) + rank(key)` via [[denseRankIds]] — id assignment
    * shuffles only the DISTINCT new keys, in parallel (no global window);
    * lookups are broadcast hash joins, so the fact rows never shuffle. */
  def dictionaryGetOrCreate(
      existing: DataFrame, // columns: keyCols :+ "id"
      rows: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val newKeys = rows.select(keys: _*).distinct()
      .join(broadcast(existing.select(keys: _*)), keyCols, "left_anti")
    val base = existing.agg(coalesce(max(col("id")), lit(0L)).as("m"))
    val assigned = denseRankIds(newKeys, keyCols, "_rk")
      .crossJoin(broadcast(base))
      .select(keys :+ (col("m") + col("_rk")).as("id"): _*)
    existing.select(keys :+ col("id"): _*).unionByName(assigned)
  }

  /** Encode fact rows against a dictionary: broadcast-join keys -> id. */
  def encodeWithDictionary(rows: DataFrame, dict: DataFrame, keyCols: Seq[String]): DataFrame =
    rows.join(broadcast(dict), keyCols, "left")
}
