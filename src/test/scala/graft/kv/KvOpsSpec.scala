package graft.kv

import graft.SparkSpec

/** KV core semantics (SURVEY.md §2 O1–O11) on small synthetic tables. */
class KvOpsSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
  }

  test("point lookup returns the single row") {
    val r = KvOps.pointLookup(base, "k", 2L).collect()
    assert(r.length == 1 && r(0).getString(1) == "b")
  }

  test("batch lookup = inner join (missing keys skipped, O14 semantics)") {
    import spark.implicits._
    val keys = Seq(2L, 3L, 99L).toDF("k")
    val got = KvOps.batchLookup(base, keys, "k").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(2L, 3L)))
  }

  test("upsert: updates replace, inserts append, others carry over") {
    import spark.implicits._
    val ups = Seq((2L, "B", 200.0), (9L, "z", 90.0)).toDF("k", "name", "v")
    val got = KvOps.upsert(base, ups, "k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> (("a", 10.0)), 2L -> (("B", 200.0)),
      3L -> (("c", 30.0)), 9L -> (("z", 90.0))))
  }

  test("delete removes listed keys only (completes reference O9 stub)") {
    import spark.implicits._
    val got = KvOps.delete(base, Seq(1L, 3L).toDF("k"), "k")
      .collect().map(_.getLong(0))
    assert(got.sameElements(Array(2L)))
  }
}
