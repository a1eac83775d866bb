package graft.kv

import graft.SparkSpec
import graft.operators.KvAria

/** Law spec for the LONG bench canary (kv_long_canary): a serial Scala
  * recount of the exact 5-round fixed-point BSP recurrence over the same
  * lineitem-derived residue graph, compared bucket-for-bucket. The canary
  * is deliberately INLINED in KvAria (no shared operator code), so this
  * recount is the only guard that a refactor elsewhere cannot move it —
  * and it doubles as the determinism proof the canary doctrine rests on
  * (its min must move only with machine conditions).
  */
class LongCanarySpec extends SparkSpec {

  test("kv_long_canary matches a serial recount of the 5-round BSP") {
    val dir = sf("sf0.001")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // the same derivation, collected (sf0.001: ~6k lineitem rows)
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .select(($"l_orderkey" % 65536L).as("a"), ($"l_partkey" % 65536L).as("b"))
      .filter($"a" =!= $"b").distinct()
      .as[(Long, Long)].collect()

    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    var r = nodes.map(v => v -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      for ((src, dst) <- edges) {
        val c = r(src) / deg(src) // non-negative: floor-div == `div`
        contrib(dst) = contrib.getOrElse(dst, 0L) + c
      }
      r = nodes.map(v =>
        v -> (150000L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    val expected = r.toSeq.groupBy(_._1 % 32L)
      .map { case (bkt, vs) => (bkt, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)

    val got = KvAria.kvLongCanary(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
