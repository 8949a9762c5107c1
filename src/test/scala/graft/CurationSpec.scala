package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Invariants for the q61-q68 curation/profiling battery module (the
  * value-level cross-engine check is the DuckDB oracle gate; these pin the
  * properties a hash compare can't see). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q61 hash sampling is deterministic and respects per-source rates") {
    val a = q("q61_sample_hash").collect()
    val b = q("q61_sample_hash").collect()
    assert(a.toSeq === b.toSeq) // pure function of the data — stable across runs
    assert(a.nonEmpty)
    a.foreach { r =>
      val rate = if (Set("src0", "src1", "src2")(r.getString(1))) 5 else 1
      assert(r.getLong(2) < rate, s"row $r escaped its stratum's rate")
    }
  }

  test("q62 sessions are dense per user, cover all events, and respect the gap") {
    val sess = q("q62_sessionize").collect()
    val byUser = sess.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq === (1L to ids.length)) // dense 1..N
      // sessions are disjoint and ordered: next session starts > gap after
      // the previous one ends (30 min in µs)
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getLong(3) - p.getLong(4) > 1800000000L,
            s"sessions ${p.getLong(1)} and ${n.getLong(1)} closer than the gap")
        case _ =>
      }
    }
    val total = sess.map(_.getLong(2)).sum
    assert(total === spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q64 repetition profile bounds: top_frac and distinct_ratio in (0, 1]") {
    val rows = q("q64_repetition_profile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(3) <= r.getLong(1)) // top token count <= tokens
      assert(r.getLong(2) <= r.getLong(1)) // distinct <= tokens
    }
  }

  test("q66 exact corr agrees with Spark's corr() to float tolerance") {
    // corr() streams doubles (order-dependent), so only approximate
    // agreement is expected — the battery query's value is the decimal-sum
    // form both engines compute exactly
    val exact = q("q66_corr_exact").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val approx = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) => assert(math.abs(v - approx(k)) < 1e-9, k) }
  }

  test("q68 tf-idf ranks by score then term, 3 per doc") {
    val rows = q("q68_tfidf_topterms").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val ordered = rs.sortBy(_.getLong(3))
      ordered.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(2) > lo.getDouble(2) ||
            (hi.getDouble(2) == lo.getDouble(2) && hi.getString(1) < lo.getString(1)))
        case _ =>
      }
    }
  }

  test("topk aggregator threshold fast-path matches sort-take on bulk input") {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    // deterministic pseudo-random scores; enough rows that most take the
    // O(1) reject branch (buffer full, score below the kth)
    val rows = (0 until 2000).map { i =>
      (i % 7L, Scored(i.toLong, ((i * 2654435761L) % 1000003L).toDouble))
    }
    val got = rows.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(5).toColumn.name("top")).collect().toMap
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sortBy(s => (-s.score, s.id)).take(5).map(_.id).toSeq
    }
    want.foreach { case (g, ids) => assert(got(g).map(_.id) === ids, s"group $g") }
  }
}
