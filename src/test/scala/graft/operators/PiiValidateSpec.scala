package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** luhnValid / ssnValid / nanpValid + the text_pii_validate gate query:
  * known true/false positives for every validator family (the DuckDB gate
  * proves engine parity on the derived corpus; these prove the checksums
  * and format rules are the PUBLISHED ones, on hand-picked numbers).
  */
class PiiValidateSpec extends SparkSpec {

  private def check(valid: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      cand: String): Boolean = {
    import spark.implicits._
    Seq(cand).toDF("c").select(valid(col("c")).as("v")).head().getBoolean(0)
  }

  test("Luhn accepts the published test card numbers") {
    // the canonical network test numbers (public BIN test ranges)
    assert(check(TextOps.luhnValid, "4111111111111111")) // Visa
    assert(check(TextOps.luhnValid, "5500005555555559")) // MC test
    assert(check(TextOps.luhnValid, "4012888888881881")) // Visa
  }

  test("Luhn rejects off-by-one and transposed digits") {
    assert(!check(TextOps.luhnValid, "4111111111111112"))
    assert(!check(TextOps.luhnValid, "4111111111111110"))
    // Luhn catches ADJACENT transposition (except 09<->90): swap two
    // adjacent distinct digits of a valid number
    assert(!check(TextOps.luhnValid, "4112888888881881"))
  }

  test("SSN issuance rules reject 000/666/9xx areas, 00 group, 0000 serial") {
    assert(check(TextOps.ssnValid, "078-05-1120")) // the Woolworth card
    assert(!check(TextOps.ssnValid, "000-12-3456"))
    assert(!check(TextOps.ssnValid, "666-12-3456"))
    assert(!check(TextOps.ssnValid, "912-12-3456")) // ITIN range
    assert(!check(TextOps.ssnValid, "123-00-3456"))
    assert(!check(TextOps.ssnValid, "123-45-0000"))
    assert(check(TextOps.ssnValid, "899-45-6789")) // last valid area
  }

  test("NANP rules reject 0/1-leading area and exchange codes") {
    assert(check(TextOps.nanpValid, "415-555-2671"))
    assert(!check(TextOps.nanpValid, "115-555-2671")) // area starts 1
    assert(!check(TextOps.nanpValid, "015-555-2671")) // area starts 0
    assert(!check(TextOps.nanpValid, "415-155-2671")) // exchange starts 1
    assert(!check(TextOps.nanpValid, "415-055-2671")) // exchange starts 0
    assert(check(TextOps.nanpValid, "999-999-9999")) // format-valid
  }

  test("gate query: every family reports raw >= valid > 0 and raw = ndocs") {
    val rows = TextOps.piiValidate(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("card", "phone", "ssn"))
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .count()
    rows.foreach { r =>
      val (raw, valid) = (r.getLong(1), r.getLong(2))
      // one synthesized candidate per family per doc
      assert(raw == nDocs, s"family ${r.getString(0)}")
      // the hash-derived candidates must exercise BOTH branches of each
      // validator, else the query measures nothing
      assert(valid > 0 && valid < raw, s"family ${r.getString(0)}")
    }
  }

  test("validated counts match a scala-side recount of the same rules") {
    // independent recount: derive the candidates exactly as the query
    // does and validate them in plain Scala
    def luhn(s: String): Boolean = {
      val sum = s.zipWithIndex.map { case (c, i) =>
        val v = c - '0'
        if (i % 2 == 0) { val d = v * 2; if (d > 9) d - 9 else d } else v
      }.sum
      sum % 10 == 0
    }
    val ids = 0L until 500L
    val expCard = ids.count { id =>
      luhn(f"${(id * 2654435761L + 12345L) % 10000000000000000L}%016d")
    }
    val expPhone = ids.count { id =>
      val a = id * 3 % 1000; val e = id * 11 % 1000
      a >= 200 && a <= 999 && e >= 200 && e <= 999
    }
    val expSsn = ids.count { id =>
      val a = id * 13 % 1000; val g = id * 7 % 100; val s = id * 31 % 10000
      a != 0 && a != 666 && a < 900 && g != 0 && s != 0
    }
    val got = TextOps.piiValidate(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("card") == expCard)
    assert(got("phone") == expPhone)
    assert(got("ssn") == expSsn)
  }
}
