package graft.operators

import graft.SparkSpec

/** text_textrank_terms: the word-graph PageRank recounts from a serial
  * fixed-point power iteration over a serially-rebuilt co-occurrence
  * graph (window 3, support ≥ 5, self-pairs excluded).
  */
class TextRankSpec extends SparkSpec {

  test("top-20 terms match a serial power iteration on the word graph") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ").toSeq)
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (ws <- docs; i <- ws.indices; k <- 1 to 3 if i + k < ws.length) {
      val (x, y) = (ws(i), ws(i + k))
      if (x != y) {
        val key = if (x < y) (x, y) else (y, x)
        pairCounts(key) = pairCounts.getOrElse(key, 0L) + 1L
      }
    }
    val kept = pairCounts.filter(_._2 >= 5L).keys.toSeq
    val edges = kept.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = edges.map(_._1).distinct
    val deg = edges.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (src, dst) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + rank(src) / deg(src)
      }
      rank = nodes.map(v =>
        v -> (150000L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    val want = rank.toSeq.sortBy { case (t, r) => (-r, t) }.take(20)
    val got = TextOps.textRankTerms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.head._2 > 150000L,
      "the top term must have accumulated contribution mass")
  }
}
