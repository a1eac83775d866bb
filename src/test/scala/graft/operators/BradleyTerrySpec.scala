package graft.operators

import graft.SparkSpec

/** eval_bradley_terry: a serial recount of the exact integer MM fit on
  * the gate corpus, plus a constructed round-robin whose dominance order
  * the BT MLE must reproduce.
  */
class BradleyTerrySpec extends SparkSpec {

  test("matches a serial recount of the integer MM iteration") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val S = 1048576L
    // serial replay of the same pipeline
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lang", "text").as[(Long, String, String)]
      .collect()
    val nd = docs.map { case (id, lang, t) =>
      (id / 2, id % 2, lang, t.split(" ", -1).distinct.length.toLong)
    }
    val matches = nd.filter(_._2 == 0).flatMap { a =>
      nd.find(b => b._1 == a._1 && b._2 == 1).map(b => (a, b))
    }.filter { case (a, b) => a._3 != b._3 }
      .map { case (a, b) =>
        if (b._4 > a._4) (b._3, a._3) else (a._3, b._3)
      }
    val wl = matches.groupBy(identity).map { case ((w, l), xs) =>
      (w, l, xs.length.toLong)
    }.toSeq
    val games = (wl.map(t => (t._1, t._2, t._3)) ++
      wl.map(t => (t._2, t._1, t._3)))
      .groupBy(t => (t._1, t._2))
      .map { case ((i, j), xs) => (i, j, xs.map(_._3).sum) }.toSeq
    val langs = games.map(_._1).distinct.sorted
    val wins = langs.map(l =>
      l -> wl.filter(_._1 == l).map(_._3).sum).toMap
    var sc = langs.map(l => l -> S).toMap
    for (_ <- 1 to TextOps.BtIters) {
      val inv = langs.map { i =>
        i -> games.filter(_._1 == i)
          .map(g => g._3 * S / (sc(g._1) + sc(g._2))).sum
      }.toMap
      val raw = langs.map(i =>
        i -> wins(i) * S / math.max(inv(i), 1L)).toMap
      val d = raw.values.max / S + 1
      sc = langs.map(i => i -> math.max(raw(i) / d, 1L)).toMap
    }
    val want = langs.map(l =>
        (l, wins(l), games.filter(_._1 == l).map(_._3).sum, sc(l)))
      .sortBy(t => (-t._4, t._1))
    val got = TextOps.evalBradleyTerry(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("a dominance round-robin ranks A > B > C") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("bt").toString
    // pairs: A beats B twice, B beats C twice, A beats C twice — the
    // winner is the even doc with MORE distinct tokens
    val rows = Seq(
      (0L, "A", "w1 w2 w3"), (1L, "B", "w1 w2"),
      (2L, "A", "w1 w2 w3"), (3L, "B", "w1 w2"),
      (4L, "B", "w1 w2 w3"), (5L, "C", "w1 w2"),
      (6L, "B", "w1 w2 w3"), (7L, "C", "w1 w2"),
      (8L, "A", "w1 w2 w3"), (9L, "C", "w1 w2"),
      (10L, "A", "w1 w2 w3"), (11L, "C", "w1 w2"))
    rows.toDF("doc_id", "lang", "text")
      .selectExpr("doc_id", "text", "lang", "'fix' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = TextOps.evalBradleyTerry(spark, work)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq("A", "B", "C"),
      s"order ${got.toSeq}")
    assert(got.map(_._2).toSeq == Seq(4L, 2L, 0L)) // wins
    assert(got.map(_._3).toSeq == Seq(4L, 4L, 4L)) // games each
    assert(got(0)._4 > got(1)._4 && got(1)._4 > got(2)._4)
  }
}
