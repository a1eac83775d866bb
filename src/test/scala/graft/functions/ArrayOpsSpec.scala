package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd integer-vector kernels: exact values, and loud failure on
  * malformed (length-mismatched) vectors instead of a silently-truncated
  * plausible result.
  */
class ArrayOpsSpec extends SparkSpec {

  test("dot and norm2 compute exact integer values") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, -5L, 6L))).toDF("a", "b")
    val r = df.select(
      ArrayOps.longDot(col("a"), col("b")).as("d"),
      ArrayOps.longNorm2(col("a")).as("n")).collect().head
    assert(r.getLong(0) == (4L - 10L + 18L))
    assert(r.getLong(1) == (1L + 4L + 9L))
  }

  test("length mismatch raises instead of truncating") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ArrayOps.longDot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("vector lengths differ"))))
  }
}
