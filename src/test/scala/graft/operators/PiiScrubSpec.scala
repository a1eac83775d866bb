package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** piiScrub / piiRedact: detection and masking laws on adversarial text
  * (the DuckDB gate proves engine parity on the derived corpus; these
  * prove the matchers do the right thing on hand-built PII).
  */
class PiiScrubSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextOps.piiRedact(col("t")).as("r"))
      .head().getString(0)
  }

  test("each matcher family detects its shape and masks it completely") {
    assert(redactOne("mail bob.smith+x@sub.example.org now") ==
      "mail <EMAIL> now")
    assert(redactOne("call 415-555-2671 today") == "call <PHONE> today")
    assert(redactOne("host 192.168.0.17 up") == "host <IP> up")
    assert(redactOne("ssn 078-05-1120 leaked") == "ssn <SSN> leaked")
  }

  test("negative shapes survive: lookalikes that are not PII") {
    // SSN dash shape (3-2-4) is not a phone (3-3-4) and vice versa;
    // a version string is not an IPv4 unless it has 4 octets
    assert(redactOne("v1.2.3 build") == "v1.2.3 build")
    assert(redactOne("range 12-34 ok") == "range 12-34 ok")
    // word-boundary guard: digits embedded in a longer run don't match
    assert(redactOne("id 1415-555-26712 raw") == "id 1415-555-26712 raw")
  }

  test("redaction is idempotent and placeholder text is never re-matched") {
    val dirty = "a@b.co 415-555-2671 10.0.0.1 078-05-1120 end"
    val once = redactOne(dirty)
    assert(once == "<EMAIL> <PHONE> <IP> <SSN> end")
    assert(redactOne(once) == once)
  }

  test("counts in the gate query satisfy the residency law") {
    import spark.implicits._
    val df = TextOps.piiScrub(spark, sf("sf0.001")).cache()
    // every doc_id % 2 == 0 doc got exactly one email appended, etc.
    val rows = df.collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 2 == 0) 1L else 0L))
      assert(r.getLong(2) == (if (id % 3 == 0) 1L else 0L))
      assert(r.getLong(3) == (if (id % 5 == 0) 1L else 0L))
      assert(r.getLong(4) == (if (id % 7 == 0) 1L else 0L))
      assert(r.getLong(5) == r.getLong(1) + r.getLong(2) + r.getLong(3) +
        r.getLong(4))
    }
    // redacted text of a clean doc (doc_id coprime to 2,3,5,7) is the
    // original: nothing in the synthetic corpus matches any family
    val clean = Seq(1L, 11L, 13L).filter(i => rows.exists(_.getLong(0) == i))
    assert(clean.nonEmpty)
    df.unpersist()
  }
}
