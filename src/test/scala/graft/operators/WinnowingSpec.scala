package graft.operators

import graft.SparkSpec

/** text_winnowing: the MOSS fingerprint pipeline. Laws:
  *  - the distributed match table recounts from a serial winnowing pass
  *    (same rolling hash, window-min selection, df prune, pair count);
  *  - the detection GUARANTEE: any doc pair sharing a run of ≥ 7 tokens
  *    (k + w − 1 with k = w = 4) shares ≥ 1 raw fingerprint — checked on
  *    every such pair the corpus actually contains, pre-prune (the prune
  *    trades the guarantee for join volume, which is why the serial
  *    recount applies it identically).
  */
class WinnowingSpec extends SparkSpec {

  private val P = 2147483647L

  private def code(w: String): Long = {
    def a(i: Int): Long = if (i < w.length) w.charAt(i).toLong else 0L
    (a(0) * 65536L + a(1) * 256L + a(2) + w.length) * 256L +
      (if (w.nonEmpty) w.charAt(w.length - 1).toLong else 0L)
  }

  /** doc -> raw (pre-prune) winnowing fingerprint set. */
  private def fpsOf(tokens: Seq[String]): Set[Long] = {
    val cs = tokens.map(code)
    val grams = (0 to cs.length - 4).map { i =>
      (((cs(i) % P * 131071L + cs(i + 1)) % P * 131071L +
        cs(i + 2)) % P * 131071L + cs(i + 3) % P) % P
    }
    (0 to grams.length - 4).map(i => grams.slice(i, i + 4).min).toSet
  }

  test("match table recounts serially; detection guarantee holds") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .sortBy(_._1)
    val fps = docs.map { case (id, ws) => id -> fpsOf(ws) }.toMap

    // serial recount with the same df prune (2 <= df <= 10)
    val df = fps.values.flatten.groupBy(identity)
      .map { case (fp, g) => fp -> g.size }
    val keep = df.filter { case (_, d) => d >= 2 && d <= 10 }.keySet
    val pr = fps.map { case (id, s) => id -> s.intersect(keep) }
    val want = (for {
      (a, sa) <- pr.toSeq; (b, sb) <- pr.toSeq if a < b
      n = sa.intersect(sb).size if n > 0
    } yield (a, b, n.toLong))
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, n), i) => (a, b, n, i + 1L) }
    val got = TextOps.winnowingMatches(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
      .toSeq
    assert(got == want)

    // guarantee: a shared >= 7-token run implies a shared RAW fingerprint
    val gramsOf = docs.map { case (id, ws) =>
      id -> ws.sliding(7).map(_.mkString(" ")).toSet
    }.toMap
    var checked = 0
    for ((a, ga) <- gramsOf.toSeq; (b, gb) <- gramsOf.toSeq
         if a < b && ga.intersect(gb).nonEmpty) {
      checked += 1
      assert(fps(a).intersect(fps(b)).nonEmpty,
        s"docs $a,$b share a 7-token run but no raw fingerprint")
    }
    info(s"detection guarantee checked on $checked corpus pairs")
  }
}
