package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.functions.ZOrder2

/** Z-order clustering: bit-level Morton invariants plus the layout claim
  * itself — matching rows for a predicate on EITHER dimension concentrate
  * into few files, vs a single-key sort where the non-sort dimension
  * scatters over every file. File containment (distinct files holding
  * matching rows) is the honest proxy for what parquet min-max pruning
  * can skip: a file with no matching rows in a z-local layout also has a
  * non-matching min-max range, so the scan never reads it. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("morton bit interleave: exact positions, box monotonicity") {
    assert(ZOrder2.morton(0L, 0L) === 0L)
    assert(ZOrder2.morton(1L, 0L) === 1L)
    assert(ZOrder2.morton(0L, 1L) === 2L)
    assert(ZOrder2.morton(3L, 3L) === 15L)
    assert(ZOrder2.morton(0xffffffffL, 0L) === 0x5555555555555555L)
    assert(ZOrder2.morton(0L, 0xffffffffL) === 0xaaaaaaaaaaaaaaaaL)
    // strictly growing along each axis within a quadrant
    for (v <- 1L until 16L) {
      assert(ZOrder2.morton(v, 5L) > ZOrder2.morton(v - 1, 5L))
      assert(ZOrder2.morton(5L, v) > ZOrder2.morton(5L, v - 1))
    }
    // spread() hits only even bit positions
    for (v <- Seq(1L, 0x80000000L, 0xdeadbeefL))
      assert((ZOrder2.spread(v) & 0xaaaaaaaaaaaaaaaaL) === 0L)
  }

  test("codegen expression equals the scala kernel") {
    ZOrder2.register(spark)
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 37, i % 101)).toDF("a", "b")
    val got = df.select(ZOrder2.zorder2(col("a"), col("b"))).as[Long].collect()
    val want = (0L until 1000L).map(i => ZOrder2.morton(i % 37, i % 101))
    assert(got.toSeq === want)
  }

  test("z-layout concentrates both-dimension predicates into few files") {
    import spark.implicits._
    // 256x256 grid, 16 files of 4096 rows each
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft-z").toString
    val linDir = Files.createTempDirectory("graft-lin").toString
    ZOrderLayout.write(grid, "x", "y", zDir, files = 16)
    // the baseline every single-key table has: sorted by x only
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)

    def filesHit(dir: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).where(cond)
        .select(input_file_name()).distinct().count()

    // predicate on the NON-sort dimension: x-sorted scatters it everywhere
    val zY = filesHit(zDir, col("y").between(10, 20))
    val linY = filesHit(linDir, col("y").between(10, 20))
    assert(linY === 16L, s"x-sorted layout should scatter y-rows over all files, got $linY")
    assert(zY <= 8L, s"z-layout should confine y-rows to few files, got $zY")
    // predicate on x: z-layout stays competitive with the x-sort
    val zX = filesHit(zDir, col("x").between(10, 20))
    assert(zX <= 8L, s"z-layout should confine x-rows to few files, got $zX")
    // and both-dimension boxes are the best case
    val zBox = filesHit(zDir, col("x").between(10, 20) && col("y").between(10, 20))
    assert(zBox <= 2L, s"z-layout box query should hit ~1 file, got $zBox")
    // rows are intact
    assert(spark.read.parquet(zDir).count() === 256L * 256L)
  }
}
