package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** Parquet bloom-filter point-lookup skipping (`graft.bloom.columns`).
  *
  * Dimension predicates prune via chunk directories and sorted row-group
  * min/max; a needle lookup on a HIGH-CARDINALITY VALUE column has neither
  * (values are unsorted within a chunk, so every row group's min/max
  * covers everything). The bloom is the missing skip index: row groups
  * that provably lack the value are skipped at the footer. The predicate
  * reaches parquet through the read-optimized unique-baseline path
  * (UniqueScanSpec): after optimize there is no MVCC resolve, so value
  * predicates push all the way down.
  */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 200000L
  // high-cardinality, unsorted-within-chunk fingerprint (ANSI-safe scramble)
  private def fpOf(k: Long): Long =
    spark.range(1).select(expr(s"xxhash64(cast($k as bigint))")).head.getLong(0)

  /** rows scanned by the leaf file scans (post row-group/page skip) */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case l if l.children.isEmpty && l.subqueries.isEmpty => Seq(l)
      case other => (other.children ++ other.subqueries).flatMap(leaves)
    }
    leaves(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  private def build(bloom: Boolean): MatDb = {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val db = MatDb.create(spark,
      MatSchema(Seq(Dimension("k", 1000000)), // one chunk: isolate the bloom
        Seq(ValueCol("fp"), ValueCol("v"))), dir, "manifest")
    val props =
      Map("parquet.block.size" -> "65536") ++ // many small row groups
        (if (bloom) Map("graft.bloom.columns" -> "fp") else Map.empty)
    Storage.writeProps(java.nio.file.Paths.get(dir), props)
    import spark.implicits._
    val t = db.newTransaction()
    t.addRows(spark.range(N).select(col("id").as("k"),
      expr("xxhash64(id)").as("fp"),
      (col("id") * 2).as("v")))
    t.commit()
    db.optimize() // unique baseline: value predicates reach parquet
    db
  }

  test("blooms are written for declared columns only, and skip row groups") {
    val db = build(bloom = true)

    // footer evidence: fp has a bloom, v does not
    val file = java.nio.file.Files.walk(java.nio.file.Paths.get(db.root.toString))
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("="))
      .findFirst()
      .orElseGet(() => java.nio.file.Files.walk(java.nio.file.Paths.get(db.root.toString))
        .filter(_.toString.endsWith(".parquet")).findFirst().get())
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString), conf))
    try {
      val block = reader.getRowGroups.get(0)
      import scala.jdk.CollectionConverters._
      def chunk(name: String) = block.getColumns.asScala
        .find(_.getPath.toDotString == name).get
      val bfReader = reader.getBloomFilterDataReader(block)
      assert(bfReader.readBloomFilter(chunk("fp")) != null,
        "declared bloom column has no bloom filter in the footer")
      assert(bfReader.readBloomFilter(chunk("v")) == null,
        "undeclared column grew a bloom filter")
      assert(reader.getRowGroups.size > 1 || reader.getRecordCount < N,
        "expected parquet.block.size passthrough to yield multiple row groups")
    } finally reader.close()

    // a needle hit returns its row while decoding only the row groups the
    // bloom could not rule out
    val hit = db.snapshot().where(col("fp") === fpOf(123456L))
    val got = hit.collect()
    assert(got.length == 1 && got.head.getAs[Long]("k") == 123456L)
    val hitScanned = scannedRows(db.snapshot().where(col("fp") === fpOf(123456L)))
    assert(hitScanned < N / 4, s"bloom hit decoded $hitScanned of $N rows")

    // a (whp) absent needle decodes (near) nothing
    val missScanned = scannedRows(db.snapshot().where(col("fp") === 1L))
    assert(missScanned < N / 4, s"bloom miss decoded $missScanned of $N rows")
  }

  test("SQL path: TBLPROPERTIES declare the bloom; IN-list lookups skip too") {
    val root = Files.createTempDirectory("graft-bloom-sql")
    spark.conf.set("spark.sql.catalog.gbloom",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbloom.root", root.toString)
    spark.sql("CREATE TABLE gbloom.t (k BIGINT, fp BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.dims' = 'k:1000000', " +
      "'graft.bloom.columns' = 'fp', 'parquet.block.size' = '65536')")
    spark.sql(s"INSERT INTO gbloom.t " +
      s"SELECT id, xxhash64(id), id * 2 FROM range(0, $N)")
    spark.sql("CALL gbloom.system.optimize('t')").collect()

    val file = java.nio.file.Files.walk(root)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString),
        spark.sessionState.newHadoopConf()))
    try {
      import scala.jdk.CollectionConverters._
      val block = reader.getRowGroups.get(0)
      val fp = block.getColumns.asScala.find(_.getPath.toDotString == "fp").get
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(fp) != null,
        "TBLPROPERTIES bloom declaration did not reach the segment writer")
    } finally reader.close()

    // IN-list: Spark pushes In as per-value equality, each consulting the
    // bloom — a multi-needle lookup skips like a single-needle one
    val needles = Seq(7L, 123456L).map(fpOf)
    val q = spark.sql(s"SELECT k FROM gbloom.t WHERE fp IN " +
      s"(${needles.mkString(",")})")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 123456L))
    val scanned = scannedRows(spark.sql(
      s"SELECT k FROM gbloom.t WHERE fp IN (${needles.mkString(",")})"))
    assert(scanned < N / 4, s"IN-list decoded $scanned of $N rows")
  }

  test("mixed hinted/unhinted bloom columns scope the adaptive flag per column") {
    val opts = Storage.parquetWriteOptions(Map(
      "graft.bloom.columns" -> "fp, doc",
      "graft.bloom.ndv.fp" -> "50000"))
    assert(opts("parquet.bloom.filter.enabled#fp") == "true")
    assert(opts("parquet.bloom.filter.enabled#doc") == "true")
    assert(opts("parquet.bloom.filter.expected.ndv#fp") == "50000")
    // the unhinted column gets COLUMN-SCOPED adaptive sizing; the global
    // flag would take precedence per column in parquet-mr and silently
    // ignore fp's explicit ndv hint
    assert(opts("parquet.bloom.filter.adaptive.enabled#doc") == "true")
    assert(!opts.contains("parquet.bloom.filter.adaptive.enabled"),
      "global adaptive flag must not be emitted")
  }

  test("control: without the bloom the same lookup decodes every row group") {
    val db = build(bloom = false)
    val scanned = scannedRows(db.snapshot().where(col("fp") === fpOf(123456L)))
    assert(scanned > N / 2,
      s"expected a full decode without blooms, saw $scanned of $N — " +
        "min/max must not be able to stand in for the bloom on this data")
  }
}
