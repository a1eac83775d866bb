package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** skewSaltedJoin / corpusProfile: the salted join must equal the plain
  * join bit-for-bit, and the profile row must match an exact in-memory
  * recount.
  */
class ProfileSaltSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("salted join equals the plain join + group by exactly") {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .as[(Long, String)].collect()
    val df = tok.groupBy(_._2).view
      .mapValues(rows => rows.map(_._1).distinct.length.toLong)
    val expect = tok.groupBy(_._2).map { case (w, rows) =>
      w -> ((rows.length.toLong, df(w)))
    }
    val got = Skew.skewSaltedJoin(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  test("corpusProfile matches an exact recount") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"text")
      .as[(Long, String, String, String)].collect()
    val lens = docs.map(_._4.split(" ").length.toLong).sorted
    def medianFloor(xs: Array[Long]): Long = {
      val n = xs.length
      val lo = xs((n - 1) / 2); val hi = xs(n / 2)
      // exact interpolated percentile at 0.5, floored
      math.floor((lo + hi) / 2.0).toLong
    }
    val vocab = docs.flatMap(_._4.split(" ")).distinct.length.toLong
    val nd = docs.length.toLong
    val hhi = docs.groupBy(_._2).values
      .map(g => 1000L * g.length / nd)
      .map(s => s * s).sum / 1000L
    val r = TextOps.corpusProfile(spark, dir).collect().head
    assert(r.getLong(0) == nd)
    assert(r.getLong(1) == lens.sum)
    assert(r.getLong(2) == lens.min)
    assert(r.getLong(3) == medianFloor(lens))
    assert(r.getLong(4) == lens.max)
    assert(r.getLong(5) == docs.map(_._2).distinct.length.toLong)
    assert(r.getLong(6) == docs.map(_._3).distinct.length.toLong)
    assert(r.getLong(7) == vocab)
    assert(r.getLong(8) == hhi)
  }
}
