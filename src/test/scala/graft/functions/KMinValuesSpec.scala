package graft.functions

import graft.SparkSpec

/** The KMV UDAF: bounded, deduping, and partition-independent — the merge
  * path (partial buffers → union → trim) must give the same answer as a
  * single-partition pass.
  */
class KMinValuesSpec extends SparkSpec {

  test("k smallest distinct values, any partitioning") {
    import spark.implicits._
    import KMinValues.kMinValues
    val data = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L, 8L).toDF("v")
    for (parts <- Seq(1, 4, 8)) {
      val got = data.repartition(parts)
        .agg(kMinValues($"v", 3)).collect().head.getSeq[Long](0)
      assert(got == Seq(1L, 3L, 5L), s"parts=$parts")
    }
  }

  test("fewer distinct values than k returns them all; nulls are skipped") {
    import spark.implicits._
    import KMinValues.kMinValues
    val data = Seq(Some(2L), None, Some(2L), Some(4L)).toDF("v")
    val got = data.agg(kMinValues($"v", 10)).collect().head.getSeq[Long](0)
    assert(got == Seq(2L, 4L))
  }
}
