package graft.operators

import graft.SparkSpec

/** eval_pass_at_k: the exact-combinatorics law (the floored-permille fold
  * equals 1000 − ⌊…⌊1000·(n−c)/n⌋·(n−c−1)/(n−1)⌋…⌋, which brackets the
  * true 1 − C(n−c,k)/C(n,k) within k‰ from above) plus the guard cases.
  */
class PassAtKSpec extends SparkSpec {

  private def serial(n: Long, c: Long, k: Int): Long =
    if (n - c < k) 1000L
    else 1000L - (0 until k).foldLeft(1000L) { (acc, i) =>
      acc * math.max(n - c - i, 0L) / (n - i)
    }

  test("matches the serial fold and brackets the exact estimator") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val got = Events.passAtK(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, c, p1, p5, p10) =>
      assert(p1 == serial(n, c, 1))
      assert(p5 == serial(n, c, 5))
      assert(p10 == serial(n, c, 10))
      // exact binomial-ratio reference: the permille fold may only round
      // UP (each floor shrinks the failure product), by at most k per mille
      def exact(k: Int): Double = {
        if (n - c < k) 1.0
        else 1.0 - (0 until k).map(i => (n - c - i).toDouble / (n - i)).product
      }
      for ((k, p) <- Seq((1, p1), (5, p5), (10, p10))) {
        val e = exact(k) * 1000
        assert(p >= e - 1e-9 && p <= e + k,
          s"pass@$k $p outside [${e}, ${e + k}] for n=$n c=$c")
      }
      // monotone in k: more samples can only help
      assert(p1 <= p5 && p5 <= p10)
    }
  }

  test("hand cases: all-fail, all-pass, and the n-c<k guard") {
    assert(serial(10, 0, 5) == 0L)   // no successes: pass@k = 0
    assert(serial(10, 10, 1) == 1000L)
    assert(serial(3, 1, 3) == 1000L) // n-c=2 < 3: guard fires
    assert(serial(3, 1, 1) == 334L)  // 1000 - 1000*2 div 3 (ceil bias)
    assert(serial(3, 1, 2) == 667L)  // 1 - C(2,2)/C(3,2) = 2/3
  }
}
