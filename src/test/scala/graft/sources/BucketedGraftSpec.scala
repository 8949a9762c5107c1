package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Dimension, MatDb, MatSchema, TestSpark, ValueCol}

/** The bucketed graft layout: MVCC dedup with ZERO exchanges (the bucket
  * write pays the one hash shuffle), partition-pruned time travel, and
  * row-for-row parity with the directory-layout resolve. */
class BucketedGraftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = MatSchema(
    Seq(Dimension("t", 50), Dimension("sensor", 10)), Seq(ValueCol("v")))

  private def batch(rows: Seq[(Long, Long, Long)]) = {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("t", LongType), StructField("sensor", LongType),
      StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3), st)
  }

  test("zero-exchange dedup, partition-pruned asOf, parity with MatDb") {
    val name = "bg_test"
    BucketedGraft.drop(spark, name)
    // three overlapping transactions: txn2 overwrites half of txn1, txn3
    // overwrites a quarter and adds new keys
    val b1 = (0L until 200L).map(i => (i, i % 10, 1L))
    val b2 = (0L until 100L).map(i => (i, i % 10, 2L))
    val b3 = (50L until 75L).map(i => (i, i % 10, 3L)) ++
      (200L until 220L).map(i => (i, i % 10, 3L))

    BucketedGraft.create(spark, name, schema, buckets = 4)
    val t1 = BucketedGraft.append(spark, name, schema, batch(b1), buckets = 4).get
    // an EMPTY append commits no transaction and hands out no id — the id
    // it probed must go to the next real append, not alias two callers
    assert(BucketedGraft.append(spark, name, schema, batch(Nil), buckets = 4).isEmpty)
    val t2 = BucketedGraft.append(spark, name, schema, batch(b2), buckets = 4).get
    val t3 = BucketedGraft.append(spark, name, schema, batch(b3), buckets = 4).get
    assert(Seq(t1, t2, t3) === Seq(1L, 2L, 3L))

    // parity oracle: the directory-layout MatDb over the same three commits
    val dir = Files.createTempDirectory("graft-bucketed-parity").toString
    val db = MatDb.create(spark, schema, dir)
    Seq(b1, b2, b3).foreach { b =>
      val txn = db.newTransaction(); txn.addRows(batch(b)); txn.commit()
    }
    val expected = db.snapshot().collect().toSet
    val got = BucketedGraft.snapshot(spark, name, schema).collect().toSet
    assert(got === expected)
    assert(got.size === 220)
    // newest version wins: keys 50..74 at v=3, 75..99 at v=2, 100..199 at v=1
    val byKey = got.map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(byKey(60L) === 3L && byKey(80L) === 2L && byKey(150L) === 1L)

    // THE plan property: the resolve aggregate runs on the bucket layout
    // with no Exchange anywhere (directory layout needs one hash exchange)
    val snap = BucketedGraft.snapshot(spark, name, schema)
    TestSpark.assertNoExchange(snap, "bucketed dedup")
    assert(TestSpark.finalPlan(snap).contains("Bucketed: true"))

    // time travel: asOf txn1 sees only b1; the scan prunes the txn2/txn3
    // partition directories (visibility = metadata, not IO)
    val asOf1 = BucketedGraft.snapshot(spark, name, schema, asOf = Some(t1))
    val rows1 = asOf1.collect()
    assert(rows1.length === 200 && rows1.forall(_.getLong(2) == 1L))
    val scan1 = asOf1.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan1.contains(graft.core.Scan.TxnCol),
      s"asOf must reach the scan as a partition filter:\n$scan1")

    // SQL over the resolved view keeps the zero-exchange resolve: the view
    // inlines the dedup plan, so a SQL aggregate on the dimensions reuses
    // the bucket partitioning end to end
    BucketedGraft.registerResolvedView(spark, name, schema, "bg_test_v")
    val viaSql = spark.sql("SELECT t, sensor, v FROM bg_test_v")
    assert(viaSql.collect().toSet === expected)
    TestSpark.assertNoExchange(viaSql, "SQL over the resolved bucketed view")
    val sqlAgg = spark.sql("SELECT t, sensor, max(v) AS v FROM bg_test_v GROUP BY t, sensor")
    assert(sqlAgg.count() === 220)
    TestSpark.assertNoExchange(sqlAgg, "SQL dim-aggregate over the resolved view")

    // ordered scan: dedup still exchange-free; only the final global sort
    // of RESOLVED rows may exchange (exactly one)
    val ord = BucketedGraft.orderedScan(spark, name, schema)
    val first = ord.limit(1).collect().head
    assert(first.getLong(0) === 0L)
    ord.collect()
    val ordPlan = TestSpark.finalPlan(ord)
    val exchanges = "(?m)Exchange".r.findAllIn(ordPlan).length
    assert(exchanges === 1, s"ordered scan should have exactly the sort exchange:\n$ordPlan")

    BucketedGraft.drop(spark, name)
  }

  test("randomized append sequences resolve to the sequential-upsert model") {
    // seeded property check (deterministic in CI): N random batches of
    // random unique keys upsert into the table; the snapshot must equal a
    // driver-side map applied batch-by-batch — same oracle shape as the
    // core PropertySpec, over the bucketed layout's full write+read path
    val name = "bg_prop"
    BucketedGraft.drop(spark, name)
    BucketedGraft.create(spark, name, schema, buckets = 4)
    val rnd = new scala.util.Random(20260813L)
    val model = scala.collection.mutable.Map[(Long, Long), Long]()
    (1 to 5).foreach { _ =>
      // unique keys within a batch (duplicate keys within one append
      // resolve arbitrarily by contract, so the model keys are unique)
      val keys = rnd.shuffle((0L until 120L).toVector).take(1 + rnd.nextInt(60))
      val rows = keys.map(k => (k, k % 7, rnd.nextLong(1000)))
      rows.foreach { case (t, s, v) => model((t, s)) = v }
      BucketedGraft.append(spark, name, schema, batch(rows), buckets = 4)
    }
    val got = BucketedGraft.snapshot(spark, name, schema).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === model.toMap)
    BucketedGraft.drop(spark, name)
  }

  test("two writers never share a txn id: claims are atomic, sequential, unmerged") {
    // The round-4 hazard: txn ids came from a read-then-write over the
    // partition listing, so a streaming sink and a backfill could commit
    // under the SAME id — two logical transactions merged. Ids are now
    // CLAIMED via put-if-absent partition creation at the metastore. This
    // test races real concurrent claimers, then interleaves two logical
    // writers' appends, and checks ids stay distinct and each transaction
    // holds exactly its own batch.
    val name = "bg_two_writers"
    BucketedGraft.drop(spark, name)
    BucketedGraft.create(spark, name, schema, buckets = 4)

    // phase 1: 4 threads × 5 concurrent claims — must partition 1..20 exactly
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 20).map(_ => pool.submit(
        new java.util.concurrent.Callable[Long] {
          def call(): Long = BucketedGraft.claimTxnId(spark, name)
        }))
      val claimed = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(claimed.sorted === (1L to 20L), s"claims must be distinct+dense: $claimed")
    } finally pool.shutdown()
    // dead claims (a writer that crashes after claiming) are invisible to reads
    assert(BucketedGraft.snapshot(spark, name, schema).count() === 0)
    assert(BucketedGraft.nextTxnId(spark, name) === 21L)

    // phase 2: writer A (3 batches) and writer B (3 batches) interleaved —
    // the write phases serialize (shared Hadoop staging dir, see scaladoc)
    // but every append allocates through the same claim path a concurrent
    // writer would use
    val ids = scala.collection.mutable.ArrayBuffer[(String, Long, Seq[(Long, Long, Long)])]()
    (0 until 3).foreach { i =>
      val ba = (0L until 10L).map(k => (100L * i + k, k % 10, 1000L + i))
      val bb = (0L until 10L).map(k => (100L * i + k + 50L, k % 10, 2000L + i))
      ids += (("A", BucketedGraft.append(spark, name, schema, batch(ba), buckets = 4).get, ba))
      ids += (("B", BucketedGraft.append(spark, name, schema, batch(bb), buckets = 4).get, bb))
    }
    val txns = ids.map(_._2)
    assert(txns.distinct.size === txns.size, s"txn ids must never merge: $txns")
    assert(txns === txns.sorted, s"ids allocate monotonically: $txns")
    // no merged transactions: each _txn_id partition holds exactly its batch
    ids.foreach { case (_, txn, rows) =>
      val got = spark.table(name).where(col(graft.core.Scan.TxnCol) === txn)
        .select(col("t"), col("sensor"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === rows.toSet, s"txn $txn must contain exactly its own batch")
    }
    // the O(1) allocation hint tracks the real max (claims would still
    // protect correctness if it didn't — this pins the fast path)
    val t = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    assert(t.properties.get(BucketedGraft.MaxTxnProp) === Some(txns.max.toString))
    BucketedGraft.drop(spark, name)
  }

  test("compact aborts instead of discarding a concurrently committed append") {
    val name = "bg_compact_race"
    BucketedGraft.drop(spark, name)
    BucketedGraft.create(spark, name, schema, buckets = 4)
    BucketedGraft.append(spark, name, schema,
      batch((0L until 40L).map(i => (i, i % 10, 1L))), buckets = 4)
    BucketedGraft.append(spark, name, schema,
      batch((0L until 20L).map(i => (i, i % 10, 2L))), buckets = 4)

    // a transaction that lands between compact's snapshot staging and its
    // overwrite must ABORT the compaction, not vanish (the round-4 compact
    // silently discarded it): inject the racing append through compact's
    // beforeCheck seam — the exact point the detection guards
    val racer = new java.util.concurrent.atomic.AtomicLong(-1L)
    val ex = intercept[IllegalStateException] {
      BucketedGraft.compact(spark, name, schema, buckets = 4, beforeCheck = { () =>
        racer.set(BucketedGraft.append(spark, name, schema,
          batch(Seq((500L, 0L, 9L))), buckets = 4).get)
      })
    }
    assert(ex.getMessage.contains("compact aborted"))
    assert(ex.getMessage.contains(racer.get.toString))
    // nothing was overwritten: all three transactions' rows still resolve
    val afterAbort = BucketedGraft.snapshot(spark, name, schema).collect()
    assert(afterAbort.length === 41)
    assert(afterAbort.exists(r => r.getLong(0) == 500L && r.getLong(2) == 9L))
    assert(afterAbort.exists(r => r.getLong(0) == 10L && r.getLong(2) == 2L))

    // with no concurrent writer the same compact succeeds and keeps every row
    val survivor = BucketedGraft.compact(spark, name, schema, buckets = 4)
    val snap = BucketedGraft.snapshot(spark, name, schema).collect()
    assert(snap.length === 41)
    assert(snap.exists(r => r.getLong(0) == 500L && r.getLong(2) == 9L))
    assert(BucketedGraft.nextTxnId(spark, name) === survivor + 1L)
    BucketedGraft.drop(spark, name)
  }

  test("joining two resolved bucketed tables on the key needs no exchange either") {
    val a = "bg_join_a"
    val b = "bg_join_b"
    BucketedGraft.drop(spark, a)
    BucketedGraft.drop(spark, b)
    // same bucket count on both tables = co-located partition-for-partition;
    // the MVCC dedup aggregate PRESERVES the bucket partitioning, so even
    // the post-resolve join plans with zero Exchange on either side
    BucketedGraft.create(spark, a, schema, buckets = 4)
    BucketedGraft.create(spark, b, schema, buckets = 4)
    BucketedGraft.append(spark, a, schema,
      batch((0L until 150L).map(i => (i, i % 10, 1L))), buckets = 4)
    BucketedGraft.append(spark, a, schema,
      batch((0L until 50L).map(i => (i, i % 10, 2L))), buckets = 4)
    BucketedGraft.append(spark, b, schema,
      batch((100L until 250L).map(i => (i, i % 10, 7L))), buckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedGraft.snapshot(spark, a, schema).as("x")
        .join(BucketedGraft.snapshot(spark, b, schema).as("y"),
          Seq("t", "sensor"))
        .select(col("t"), col("sensor"), col("x.v").as("va"), col("y.v").as("vb"))
      val rows = joined.collect()
      // keys 100..149 overlap; newest versions: a has v=2 below 50 (not
      // overlapping), v=1 at 100..149; b has v=7 everywhere
      assert(rows.length === 50)
      assert(rows.forall(r => r.getLong(2) == 1L && r.getLong(3) == 7L))
      TestSpark.assertNoExchange(joined, "co-located resolve+join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    BucketedGraft.drop(spark, a)
    BucketedGraft.drop(spark, b)
  }

  test("shallowClone: zero-copy fork — identical reads, independent writes") {
    val (src, dst) = ("bg_clone_src", "bg_clone_dst")
    Seq(src, dst).foreach(BucketedGraft.drop(spark, _))
    BucketedGraft.create(spark, src, schema, buckets = 4)
    BucketedGraft.append(spark, src, schema,
      batch((0L until 100L).map(i => (i, i % 10, 1L))), buckets = 4)
    BucketedGraft.append(spark, src, schema,
      batch((0L until 50L).map(i => (i, i % 10, 2L))), buckets = 4)
    BucketedGraft.shallowClone(spark, src, dst, schema, buckets = 4)
    def rows(n: String) = BucketedGraft.snapshot(spark, n, schema)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows(dst) === rows(src), "clone reads identically")
    // hard links, not copies: a data file in the clone shares its inode
    val loc = java.nio.file.Paths.get(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(dst)).location)
    val aFile = java.nio.file.Files.walk(loc).filter(p =>
      p.toString.endsWith(".parquet")).findFirst().get()
    assert(java.nio.file.Files.getAttribute(aFile, "unix:nlink")
      .asInstanceOf[Integer] >= 2, "clone must hard-link data files")
    // independent appends: the fork diverges, the source does not see it
    BucketedGraft.append(spark, dst, schema, batch(Seq((500L, 0L, 9L))), buckets = 4)
    assert(BucketedGraft.snapshot(spark, dst, schema).count() === 101)
    assert(BucketedGraft.snapshot(spark, src, schema).count() === 100)
    Seq(src, dst).foreach(BucketedGraft.drop(spark, _))
  }

  test("analyze: resolved catalog statistics price the relation, not raw versions") {
    val name = "bg_analyze"
    BucketedGraft.drop(spark, name)
    BucketedGraft.create(spark, name, schema, buckets = 4)
    // 200 keys x 5 versions: raw rows 1000, resolved 200
    (0 until 5).foreach { i =>
      BucketedGraft.append(spark, name, schema,
        batch((0L until 200L).map(k => (k, k % 10, i.toLong))), buckets = 4)
    }
    val (n, bytes) = BucketedGraft.analyze(spark, name, schema)
    assert(n === 200L, s"resolved count, got $n")
    assert(bytes === 200L * schema.toStructType.defaultSize)
    val stats = spark.table(name).queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes === BigInt(bytes),
      s"catalog stats must price the relation: ${stats.sizeInBytes} vs $bytes")
    // rowCount propagates into plan stats only under CBO (toPlanStats)
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val cboStats = spark.table(name).queryExecution.optimizedPlan.stats
      assert(cboStats.rowCount.contains(BigInt(200)),
        s"CBO must see the resolved row count, got ${cboStats.rowCount}")
    } finally saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
    BucketedGraft.drop(spark, name)
  }
}
