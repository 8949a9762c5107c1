package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.queries.Q

/** Fixture-drift guard: the driver regenerates /root/testdata between
  * rounds, and a silent physical-type change there can break the battery
  * before any query runs (round 6: events.ts moved TIMESTAMP(NANOS) →
  * timestamp[us] and three queries died in analysis). This spec pins the
  * schema each table must present AFTER Q.table's normalization, so an
  * incompatible regeneration fails fast with a readable message instead of
  * shrinking the correctness report.
  *
  * Timestamp columns are allowed to load as TIMESTAMP or TIMESTAMP_NTZ —
  * the battery only compares them against TIMESTAMP literals, which is
  * valid for both — but events.ts must be LongType (epoch nanos) because
  * the whole battery does integer arithmetic on it.
  */
class FixturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)
  private val sf = "/root/testdata/sf0.001"

  /** null dataType in `want` = "any timestamp flavor". Checked at every
    * generated scale factor — the driver regenerates them together, but a
    * partial regeneration would otherwise slip the guard. */
  private def check(table: String, want: Seq[(String, DataType)]): Unit =
    sfDirs.foreach { dir =>
      val got = Q.table(spark, dir, table).schema
      assert(got.fieldNames.toSeq === want.map(_._1),
        s"$dir/$table columns drifted: fixture now loads as ${got.simpleString}")
      want.foreach {
        case (name, null) =>
          val dt = got(name).dataType
          assert(dt == TimestampType || dt == TimestampNTZType,
            s"$dir/$table.$name expected a timestamp flavor, fixture now loads as $dt")
        case (name, dt) =>
          assert(got(name).dataType == dt,
            s"$dir/$table.$name expected $dt, fixture now loads as ${got(name).dataType}")
      }
    }

  test("all battery tables load with the schemas the queries assume") {
    check("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    check("nation", Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    check("customer", Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    check("supplier", Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    check("part", Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    check("orders", Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      ("o_orderdate", null), "o_orderpriority" -> StringType))
    check("lineitem", Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      ("l_shipdate", null)))
    // ts MUST be epoch-nano LONG after Q.table normalization — integer
    // arithmetic on it is battery-wide (q15/q34/q62 among others).
    check("events", Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    check("documents", Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    check("embeddings", Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("events.ts normalization is session-timezone independent") {
    // a non-UTC library session must read the SAME instants: the NTZ
    // branch is pure walltime arithmetic and the instant branch reads the
    // epoch directly — neither may route through a session-tz cast
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    def fingerprint(): (Long, Long, Long) = {
      val r = Q.table(spark, sf, "events")
        .selectExpr("min(ts)", "max(ts)", "sum(ts % 1000000007)").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val underUtc = try { spark.conf.set(tzKey, "UTC"); fingerprint() }
      finally spark.conf.set(tzKey, saved)
    val underKolkata = try {
      // half-hour offset: catches whole-hour-insensitive mistakes too
      spark.conf.set(tzKey, "Asia/Kolkata"); fingerprint()
    } finally spark.conf.set(tzKey, saved)
    assert(underKolkata === underUtc,
      s"events.ts drifted with the session timezone: $underKolkata vs $underUtc")
  }

  test("events.ts normalization yields plausible epoch-nano instants") {
    val mm = Q.table(spark, sf, "events")
      .selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // sanity window: 2000-01-01 .. 2100-01-01 in epoch nanos — catches a
    // micros-as-nanos (1000x off) or seconds-as-nanos mis-normalization
    assert(lo > 946684800L * 1000000000L && hi < 4102444800L * 1000000000L,
      s"events.ts range [$lo, $hi] is not epoch-nanos — normalization drifted")
  }
}
