package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** q52–q57 (the TPC-H completion set: Q11/Q15/Q18/Q19/Q21/Q22 shapes):
  * exact in-memory recomputation of each query over the sf0.001 corpus —
  * independent of every Spark operator under test (plain Scala
  * collections), so a planner/operator regression cannot self-confirm.
  */
class TpchCompletionSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def cents(extended: Double, discount: Double): Long =
    math.round(extended * (1.0 - discount) * 100)

  private lazy val li = Tables.lineitem(spark, dir)
    .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getAs[java.time.LocalDateTime](6).toLocalDate))

  test("q52 supplier value share: threshold and shares recount") {
    val per = li.groupBy(_._2).view
      .mapValues(_.map(l => cents(l._5, l._6)).sum).toMap
    val total = per.values.sum
    val want = per.filter { case (_, v) => v * 400 > total }
    val got = Relational.q52SupplierValueShare(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet === want.keySet)
    got.foreach { case (sk, v, pm) =>
      assert(v === want(sk))
      assert(pm === v * 1000 / total)
    }
  }

  test("q53 top supplier: max-of-aggregate recount, ties surface") {
    val lo = java.time.LocalDate.parse("1997-01-01")
    val hi = java.time.LocalDate.parse("1997-04-01")
    val rev = li.filter(l => !l._7.isBefore(lo) && l._7.isBefore(hi))
      .groupBy(_._2).view.mapValues(_.map(l => cents(l._5, l._6)).sum).toMap
    val mx = rev.values.max
    val got = Relational.q53TopSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._1).toSet === rev.filter(_._2 == mx).keySet)
    got.foreach { case (_, v) => assert(v === mx) }
  }

  test("q54 large orders: HAVING-threshold membership recount") {
    val sums = li.groupBy(_._1).view
      .mapValues(_.map(_._4.toLong).sum).toMap
    val want = sums.filter(_._2 > 150)
    val got = Relational.q54LargeOrders(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(5)))
    assert(got.map(_._1).toSet === want.keySet)
    got.foreach { case (ok, q) => assert(q === want(ok)) }
  }

  test("q55 disjunctive-predicate revenue: naive recount") {
    val parts = Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val hits = li.filter { l =>
      parts.get(l._3).exists { case (brand, size) =>
        (brand == "Brand#11" && size >= 1 && size <= 10 &&
          l._4 >= 1 && l._4 <= 20) ||
        (brand == "Brand#22" && size >= 1 && size <= 20 &&
          l._4 >= 5 && l._4 <= 30) ||
        (brand == "Brand#33" && size >= 1 && size <= 30 &&
          l._4 >= 10 && l._4 <= 40)
      }
    }
    val row = Relational.q55DisjunctionRevenue(spark, dir).collect().head
    assert(row.getLong(0) === hits.map(l => cents(l._5, l._6)).sum)
    assert(row.getLong(1) === hits.length.toLong)
  }

  test("q56 waiting suppliers: semi/anti recount") {
    val odate = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) ->
        r.getAs[java.time.LocalDateTime](1).toLocalDate).toMap
    val withLate = li.flatMap { l =>
      odate.get(l._1).map(od =>
        (l._1, l._2, l._7.isAfter(od.plusDays(60))))
    }
    val suppliersOn = withLate.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val lateOn = withLate.filter(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      (o, lateSet) <- lateOn.toSeq
      s <- lateSet
      if (suppliersOn(o) - s).nonEmpty && (lateSet - s).isEmpty
    } yield s).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.q56WaitingSuppliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === want)
  }

  test("q57 dormant rich: scalar-average + anti-join recount") {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        math.round(r.getDouble(2) * 100)))
    val pos = cust.filter(_._3 > 0)
    val (sbal, nbal) = (pos.map(_._3).sum, pos.length.toLong)
    val cutoff = java.time.LocalDate.parse("2000-01-01")
    val recent = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate").collect()
      .filter(!_.getAs[java.time.LocalDateTime](1).toLocalDate
        .isBefore(cutoff))
      .map(_.getLong(0)).toSet
    val want = cust
      .filter(c => c._3 * nbal > sbal && !recent.contains(c._1))
      .groupBy(_._2).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._3).sum)).toMap
    val got = Relational.q57DormantRich(spark, dir).collect()
      .map(r => r.getAs[Number](0).longValue() ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }
}
