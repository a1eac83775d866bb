package graft.operators

import graft.SparkSpec

/** text_burstiness: serial recount of the VMR_pm fold, plus the Poisson
  * anchor law — a term occurring exactly once in every containing doc has
  * zero within-doc variance, so its burstiness_pm is exactly 0.
  */
class BurstinessSpec extends SparkSpec {

  test("top-20 matches a serial recount of the exact VMR fold") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val tf = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (d, t) => t.split(" ", -1).map(w => (d, w)) }
      .groupBy(identity).toSeq
      .map { case ((_, w), xs) => (w, xs.length.toLong) }
    val want = tf.groupBy(_._1).collect {
      case (w, xs) if xs.size >= 50 =>
        val df = xs.size.toLong
        val s1 = xs.map(_._2).sum
        val s2 = xs.map(x => x._2 * x._2).sum
        (w, df, math.floorDiv(s1 * 1000L, df),
          math.floorDiv((df * s2 - s1 * s1) * 1000L, df * s1))
    }.toSeq.sortBy { case (w, _, _, b) => (-b, w) }.take(20)

    val got = TextOps.burstiness(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("a once-per-doc term has burstiness exactly 0 (Poisson anchor)") {
    import spark.implicits._
    // 60 docs, each containing the marker exactly once plus filler that
    // never reaches df >= 50
    val docs = (0L until 60L).map(d => (d, s"anchor filler$d pad$d"))
    val work = java.nio.file.Files.createTempDirectory("burst").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'fix' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = TextOps.burstiness(spark, work)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 1 && got.head._1 == "anchor")
    assert(got.head._4 == 0L, s"VMR_pm ${got.head._4} != 0 for Poisson-1")
  }
}
