package graft.operators

import graft.SparkSpec

/** eval_rouge_n: serial clipped-overlap recount plus hand-computed
  * examples (the clipping law and the micro-F1 = 2m/(c+r) identity).
  */
class RougeSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("rouge").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'fix' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    work
  }

  test("corpus totals match a serial clipped-overlap recount") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String, n: Int): Map[String, Long] =
      t.split(" ", -1).sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val byPair = docs.groupBy(_._1 / 2).filter(_._2.length == 2)
    val want = Seq(1, 2).map { n =>
      var m, c, r = 0L
      byPair.foreach { case (_, two) =>
        val cand = grams(two.minBy(_._1)._2, n)
        val ref = grams(two.maxBy(_._1)._2, n)
        m += cand.map { case (g, cc) => math.min(cc, ref.getOrElse(g, 0L)) }.sum
        c += cand.values.sum
        r += ref.values.sum
      }
      (n.toLong, m, c, r, 1000 * m / c, 1000 * m / r, 2000 * m / (c + r))
    }
    val got = TextOps.evalRougeN(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("hand-computed pair and the clipping law") {
    import spark.implicits._
    // pair 0: cand "a b c" vs ref "a b d" -> R1 m=2/3, R2 m=1/2
    // pair 1: cand "a a a" vs ref "a x"   -> R1 clipped m=min(3,1)=1
    // doc 4 unpaired -> excluded from every total
    val work = writeDocs(Seq(0L -> "a b c", 1L -> "a b d",
      2L -> "a a a", 3L -> "a x", 4L -> "zzz zzz"))
    val got = TextOps.evalRougeN(spark, work)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // n=1: matched = 2 + 1 = 3; cand = 3 + 3 = 6; ref = 3 + 2 = 5
    assert(got(1L) == ((1L, 3L, 6L, 5L, 500L, 600L, 545L)))
    // n=2: pair0 bigrams {"a b","b c"} vs {"a b","b d"} -> m=1
    //      pair1 {"a a","a a"} vs {"a x"} -> m=0
    assert(got(2L) == ((2L, 1L, 4L, 3L, 250L, 333L, 285L)))
  }
}
