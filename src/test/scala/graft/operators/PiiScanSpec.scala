package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.TestSpark

/** graft.operators.PiiScan — battery q112's operator. Counts must match a
  * by-eye reading of crafted strings, and redaction must be a fixed point:
  * a scan after redact finds nothing, and PII-free text passes through
  * byte-identical. */
class PiiScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val crafted = Seq(
    (1L, "mail a.b+c@ex-1.org and b@sub.domain.io today"), // 2 emails
    (2L, "peer 192.168.0.1 gateway 10.0.255.254 up"),      // 2 ips
    (3L, "call 555-123-4567 or 555-000-1111 now"),         // 2 phones
    (4L, "mixed: u@d.co at 1.2.3.4 via 555-111-2222"),     // 1 each
    (5L, "clean text with no contact data at all"),        // none
    (6L, "version 1.2.3 is not an ip, 12-34-5678 not a phone")) // near-misses

  test("per-category counts match a by-eye reading") {
    import spark.implicits._
    val got = PiiScan.scan(crafted.toDF("id", "t"), "t")
      .select("id", "emails", "ips", "phones", "pii_total")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((2L, 0L, 0L, 2L)))
    assert(got(2L) === ((0L, 2L, 0L, 2L)))
    assert(got(3L) === ((0L, 0L, 2L, 2L)))
    assert(got(4L) === ((1L, 1L, 1L, 3L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L)))
    assert(got(6L) === ((0L, 0L, 0L, 0L)),
      "a 3-part version string and an 8-digit dash group must not fire")
  }

  test("redact is a fixed point: nothing left to find, clean text untouched") {
    import spark.implicits._
    val df = crafted.toDF("id", "t")
    val redacted = PiiScan.redact(df, "t")
    val rescan = PiiScan.scan(redacted, "t")
    assert(rescan.agg(sum(col("pii_total"))).collect()(0).getLong(0) === 0L)
    val clean = redacted.where(col("id") === 5L).collect()(0).getString(1)
    assert(clean === crafted(4)._2, "PII-free text must pass through unchanged")
    val marked = redacted.where(col("id") === 4L).collect()(0).getString(1)
    assert(marked === "mixed: [EMAIL] at [IP] via [PHONE]")
  }
}
