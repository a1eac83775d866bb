package graft.operators

import java.time.LocalDate

import graft.SparkSpec
import graft.sources.Tables

/** userLifecycle / leakageSafeSplit: exact recounts plus the contracts —
  * the lifecycle decomposition must sum to DAU, and no near-dup cluster
  * may straddle the split boundary.
  */
class LifecycleSplitSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("userLifecycle matches an exact recount and decomposes dau") {
    import spark.implicits._
    val du = Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string"),
        $"user_id")
      .as[(String, Long)].collect().distinct
      .map { case (d, u) => (LocalDate.parse(d), u) }
    val byUser = du.groupBy(_._2).view.mapValues(_.map(_._1).sortBy(_.toEpochDay))
    val days = du.map(_._1).distinct.sortBy(_.toEpochDay)
    val expect = days.map { d =>
      val active = du.filter(_._1 == d).map(_._2)
      val (nNew, nRet, nRes) = active.foldLeft((0L, 0L, 0L)) {
        case ((nw, rt, rs), u) =>
          val prior = byUser(u).filter(_.isBefore(d))
          if (prior.isEmpty) (nw + 1, rt, rs)
          else if (prior.last == d.minusDays(1)) (nw, rt + 1, rs)
          else (nw, rt, rs + 1)
      }
      val dauPrev = du.count(_._1 == d.minusDays(1)).toLong
      d.toString -> ((active.length.toLong, nNew, nRet, nRes,
        dauPrev - nRet))
    }.toMap
    val got = Events.userLifecycle(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
    // the decomposition identity: new + retained + resurrected = dau
    got.values.foreach { case (dau, nw, rt, rs, _) =>
      assert(nw + rt + rs == dau)
    }
    // day 1 has no history: everyone is new, nobody churned into it
    val first = got.keys.min
    assert(got(first)._2 == got(first)._1 && got(first)._5 == 0L)
  }

  test("leakageSafeSplit never lets a near-dup cluster straddle the " +
      "boundary, and conserves docs/tokens/clusters") {
    import spark.implicits._
    val clusters = TextOps.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val M = 2147483647L
    def side(label: Long): String =
      if ((label * 52361L + 24001L) % M % 10L < 8L) "train" else "eval"
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
    val expect = clusters.toSeq.groupBy { case (_, lab) => side(lab) }
      .map { case (sp, rows) =>
        sp -> ((rows.size.toLong, rows.map(r => toks(r._1)).sum,
          rows.map(_._2).distinct.size.toLong))
      }
    val got = TextOps.leakageSafeSplit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // conservation across splits
    assert(got.values.map(_._1).sum == clusters.size.toLong)
    assert(got.values.map(_._3).sum == clusters.values.toSeq.distinct.size.toLong)
    // the defining property: every cluster's members share one side
    clusters.groupBy(_._2).foreach { case (_, members) =>
      assert(members.keys.map(id => side(clusters(id))).toSet.size == 1)
    }
  }
}
