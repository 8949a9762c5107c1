package graft.core

import java.nio.file.Files
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Write-path chunk keys must be EXACT integer floorDiv over the full Long
  * range — the same function the read side uses (ChunkFunction.Bound's
  * Math.floorDiv for storage-partitioned joins, ChunkPruneRule's
  * predicate-to-chunk mapping). The old `floor(col / lit(size))` routing
  * was double division, exact only to 2^53: a dim beyond that could route
  * a row into a directory the pruner/SPJ key disagree with (wrong-results
  * class). This spec pins [[MatSchema.chunkKeyCol]] ≡ Math.floorDiv by
  * property, including the adversarial extremes, and proves the routed
  * table prunes correctly end-to-end at ±2^62. */
class ChunkKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("chunkKeyCol equals Math.floorDiv over the full Long range") {
    import spark.implicits._
    val edges = Seq(Long.MinValue, Long.MinValue + 1, -(1L << 62), -(1L << 53) - 1,
      -(1L << 53), -1L, 0L, 1L, (1L << 53) - 1, 1L << 53, (1L << 53) + 1,
      (1L << 53) + 3, 1L << 62, Long.MaxValue - 1, Long.MaxValue)
    val randoms = (1L to 200L).map(s => sample(Gen.choose(Long.MinValue, Long.MaxValue), s))
    val dims = (edges ++ randoms).distinct
    // sizes that exercise non-divisible remainders at the extremes
    for (size <- Seq(1L, 3L, 7L, 1000L, (1L << 31) - 1, (1L << 40) + 9)) {
      val got = dims.toDF("dim")
        .select(org.apache.spark.sql.functions.col("dim"),
          MatSchema.chunkKeyCol(org.apache.spark.sql.functions.col("dim"), size).as("ck"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      dims.foreach { d =>
        assert(got(d) === Math.floorDiv(d, size), s"dim=$d size=$size")
      }
    }
  }

  test("rows with dims beyond 2^53 route, prune, and round-trip exactly") {
    val schema = MatSchema(Seq(Dimension("k", 1000)), Seq(ValueCol("v")))
    val path = Files.createTempDirectory("graft-chunkkey").toString
    val db = MatDb.create(spark, schema, path)
    // (2^53+1)/1000 is where double division first misroutes; ±2^62 is the
    // verdict-prescribed extreme. Include a negative non-divisible dim so
    // the floor (not truncate) correction is exercised on disk.
    val dims = Seq(-(1L << 62) - 7, -(1L << 53) - 1, (1L << 53) + 1, 1L << 62)
    val txn = db.newTransaction()
    txn.addRowsSeq(dims.map(d => Seq[Any](d, d % 97)))
    txn.commit()

    // every physical _ck_k directory value equals Math.floorDiv of its rows
    val snap = db.snapshot().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap.keySet === dims.toSet)
    dims.foreach { d =>
      val hit = db.snapshot()
        .where(org.apache.spark.sql.functions.col("k") === d).collect()
      assert(hit.length === 1 && hit(0).getLong(1) === d % 97, s"dim=$d")
      // prune path: the chunk-range scan keyed by Math.floorDiv must find it
      val t2 = db.newTransaction()
      val ranged = t2.query(Some(Scan.chunkRange(schema, "k", Some(d), Some(d))))
        .collect().map(_.getLong(0)).toSet
      t2.rollback()
      assert(ranged.contains(d), s"chunk-range prune lost dim=$d")
    }
  }
}
