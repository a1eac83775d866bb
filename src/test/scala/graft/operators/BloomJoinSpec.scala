package graft.operators

import graft.SparkSpec

/** sketch_bloom_join: the word-as-row bloom recounts from a serial rebuild
  * with the same avalanched bit positions; the pruned exact join equals
  * the direct (no-bloom) semi join — the no-false-negative contract; and
  * the funnel is monotone (match ≤ pass ≤ probe).
  */
class BloomJoinSpec extends SparkSpec {

  private val M = 2147483647L
  private def ava(x: Long, a1: Long, b1: Long, a2: Long, b2: Long): Long = {
    val y1 = (a1 * x + b1) % M
    val y2 = y1 ^ (y1 >> 15)
    val z = (a2 * y2 + b2) % M
    (z ^ (z >> 13)) % 3072L
  }
  private def p1(x: Long) = ava(x, 2654435761L, 12007L, 1779033703L, 514229L)
  private def p2(x: Long) = ava(x, 1779033703L, 514229L, 2654435761L, 12007L)

  test("funnel equals the serial bloom rebuild; join result is bloom-free") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val keys = spark.read.parquet(dir + "/orders.parquet")
      .where("o_orderpriority = '1-URGENT' AND o_totalprice > 350000")
      .selectExpr("o_custkey").distinct().as[Long].collect().toSet
    val cust = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey", "round(c_acctbal * 100)::LONG")
      .as[(Long, Long)].collect()

    val bits = scala.collection.mutable.Set[Long]()
    keys.foreach { k => bits += p1(k); bits += p2(k) }
    val passed = cust.filter { case (x, _) => bits(p1(x)) && bits(p2(x)) }
    val matched = passed.filter { case (x, _) => keys(x) }
    val directMatch = cust.filter { case (x, _) => keys(x) }

    val r = Sketches.bloomJoin(spark, dir).collect().head
    assert(r.getLong(0) == keys.size.toLong, "n_keys")
    assert(r.getLong(1) == cust.length.toLong, "n_probe")
    assert(r.getLong(2) == passed.length.toLong, "n_pass")
    assert(r.getLong(3) == matched.length.toLong, "n_match")
    assert(r.getLong(4) == (passed.length - matched.length).toLong, "n_fp")
    assert(r.getLong(5) == matched.map(_._2).sum, "bal_cents")
    // the contract that makes bloom pruning safe: the exact join result
    // is identical with and without the bloom in front
    assert(matched.map(_._1).toSet == directMatch.map(_._1).toSet)
    assert(r.getLong(5) == directMatch.map(_._2).sum)
  }

  test("funnel monotonicity: match <= pass <= probe, fp >= 0") {
    val r = Sketches.bloomJoin(spark, sf("sf0.001")).collect().head
    assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
    assert(r.getLong(4) >= 0L)
    assert(r.getLong(3) >= 1L, "degenerate: no true matches to protect")
  }
}
