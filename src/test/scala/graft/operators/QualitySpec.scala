package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws of the data-quality audit (Quality.profile / Quality.constraints)
  * at sf0.001: internal consistency of the profile counts (pigeonhole,
  * null accounting, modal-count bounds), independent recounts of
  * representative checks from each constraint family (in-scan aggregate,
  * uniqueness, referential anti-join, cross-table temporal), and the
  * status-column rule.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = sf("sf0.001")
  private lazy val prof = Quality.profile(spark, dir).collect()
  private lazy val cons = Quality.constraints(spark, dir).collect()

  private def check(id: String): Row =
    cons.find(_.getString(0) == id).get

  test("profile covers every spec'd (table, column) exactly once") {
    val keys = prof.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys.distinct.size === keys.size)
    assert(keys.size === 12)
    assert(keys.count(_._1 == "lineitem") === 5)
  }

  test("profile count accounting: nulls, distinct, modal bounds") {
    prof.foreach { r =>
      val (n, nNull, nDist, topN) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(8))
      val nonNull = n - nNull
      assert(nNull >= 0 && nonNull > 0, r)
      // pigeonhole both ways: the modal count is at least the mean
      // bucket size and at most everything non-null
      assert(nDist >= 1 && nDist <= nonNull, r)
      assert(topN <= nonNull, r)
      assert(topN * nDist >= nonNull, r)
    }
  }

  test("profile distinct + modal value recount (l_returnflag)") {
    val li = Tables.lineitem(spark, dir)
    val hist = li.groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().sortBy(t => (-t._2, t._1))
    val r = prof.find(r => r.getString(0) == "lineitem" &&
      r.getString(1) == "l_returnflag").get
    assert(r.getLong(4) === hist.size.toLong)
    assert(r.getString(7) === hist.head._1)
    assert(r.getLong(8) === hist.head._2)
    assert(r.getString(5) === hist.map(_._1).min)
    assert(r.getString(6) === hist.map(_._1).max)
  }

  test("timestamp render is the typed min/max, canonically formatted") {
    val li = Tables.lineitem(spark, dir)
    val Row(mn: String, mx: String) = li.agg(
      date_format(min($"l_shipdate"), "yyyy-MM-dd HH:mm:ss"),
      date_format(max($"l_shipdate"), "yyyy-MM-dd HH:mm:ss")).head()
    val r = prof.find(r => r.getString(0) == "lineitem" &&
      r.getString(1) == "l_shipdate").get
    assert(r.getString(5) === mn && r.getString(6) === mx)
  }

  test("constraint battery: one row per check, status mirrors n_bad") {
    assert(cons.length === 13)
    assert(cons.map(_.getString(0)).distinct.length === 13)
    cons.foreach { r =>
      assert(r.getLong(2) > 0, r)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2), r)
      assert(r.getString(4) === (if (r.getLong(3) == 0L) "pass" else "fail"), r)
    }
  }

  test("uniqueness check recount: unique_o_orderkey") {
    val ord = Tables.orders(spark, dir)
    val dup = ord.groupBy($"o_orderkey").count()
      .filter($"count" > 1)
      .agg(coalesce(sum($"count" - 1L), lit(0L))).as[Long].head()
    assert(check("unique_o_orderkey").getLong(3) === dup)
    assert(check("unique_o_orderkey").getLong(2) === ord.count())
  }

  test("in-scan range check recount: range_l_quantity") {
    val li = Tables.lineitem(spark, dir)
    val bad = li.filter($"l_quantity" < 1.0 || $"l_quantity" > 50.0).count()
    assert(check("range_l_quantity").getLong(3) === bad)
  }

  test("referential check is a true orphan count: ri_orders_customer") {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val orphans = ord.join(cust,
        ord("o_custkey") === cust("c_custkey"), "left_anti").count()
    val r = check("ri_orders_customer")
    assert(r.getLong(3) === orphans)
    assert(r.getLong(2) === ord.count())
  }

  test("referential check CATCHES injected orphans (not vacuous)") {
    // same left-join+null-count shape as Quality.constraints, on a frame
    // with known orphans: 2 of 5 children reference missing parents
    val child = Seq(1, 2, 3, 99, 98).toDF("fk")
    val parent = Seq(1, 2, 3, 4).toDF("pk")
    val Row(n: Long, bad: Long) = child.join(
        parent, $"fk" === $"pk", "left")
      .agg(count(lit(1)), sum(when($"pk".isNull, 1L).otherwise(0L)))
      .head()
    assert((n, bad) === ((5L, 2L)))
  }

  private lazy val fds = Quality.fdCheck(spark, dir).collect()

  test("key-implied FDs hold; the battery is not vacuously green") {
    val byId = fds.map(r => r.getString(0) -> r).toMap
    for (id <- Seq("fd_custkey_nation", "fd_orderkey_date")) {
      assert(byId(id).getString(7) === "pass", id)
      assert(byId(id).getLong(5) === 0L && byId(id).getLong(6) === 0L, id)
    }
    // at least one candidate must actually be violated in the corpus,
    // otherwise the audit could pass without checking anything
    assert(fds.exists(_.getString(7) == "fail"))
    fds.foreach { r =>
      assert(r.getLong(6) >= r.getLong(5), r) // extra values >= viol groups
      assert(r.getLong(5) <= r.getLong(4), r)
    }
  }

  test("FD violation recount: fd_nation_segment") {
    val cust = Tables.customer(spark, dir)
    val nd = cust.select($"c_nationkey", $"c_mktsegment").distinct()
      .groupBy($"c_nationkey").count().as[(Long, Long)].collect()
    val r = fds.find(_.getString(0) == "fd_nation_segment").get
    assert(r.getLong(4) === nd.length.toLong)
    assert(r.getLong(5) === nd.count(_._2 > 1).toLong)
    assert(r.getLong(6) === nd.map(_._2 - 1).sum)
  }

  private lazy val drift = Quality.categoryDrift(spark, dir).collect()

  test("drift rows: cohort conservation and TV bounds") {
    assert(drift.length === 5)
    drift.foreach { r =>
      val (n1, n2, nv, tv) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n1 > 0 && n2 > 0 && nv >= 1, r)
      assert(tv >= 0L && tv <= 1000L, r)
    }
    val ev = Tables.events(spark, dir)
    val r = drift.find(r => r.getString(0) == "events").get
    assert(r.getLong(2) + r.getLong(3) === ev.count())
  }

  test("drift TV recount: events.event_type from raw counts") {
    val raw = Tables.events(spark, dir)
      .select($"event_type", ($"event_id" % 2 === 0).as("a"))
      .as[(String, Boolean)].collect()
    val n1 = raw.count(_._2).toLong
    val n2 = raw.count(!_._2).toLong
    val hist = raw.groupBy(_._1).map { case (_, xs) =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    val l1x = hist.map { case (c1, c2) => (c1 * n2 - c2 * n1).abs }.sum
    val expected = (1000L * l1x) / (2L * n1 * n2)
    val r = drift.find(r => r.getString(0) == "events").get
    assert(r.getLong(5) === expected)
    assert(r.getLong(4) === hist.size.toLong)
  }

  test("TV arithmetic: identical cohorts -> 0, disjoint supports -> 1000") {
    def tv(rows: Seq[(String, Boolean)]): Long = {
      val n1 = rows.count(_._2).toLong
      val n2 = rows.count(!_._2).toLong
      val l1x = rows.groupBy(_._1).values.map { xs =>
        (xs.count(_._2).toLong * n2 - xs.count(!_._2).toLong * n1).abs
      }.sum
      (1000L * l1x) / (2L * n1 * n2)
    }
    val same = Seq("x", "y", "y").flatMap(v => Seq((v, true), (v, false)))
    assert(tv(same) === 0L)
    val disjoint = Seq(("x", true), ("y", true), ("z", false))
    assert(tv(disjoint) === 1000L)
  }

  private lazy val ndrift = Quality.numericDrift(spark, dir).collect()

  test("numeric drift rows: cohort conservation and TV bounds") {
    assert(ndrift.length === 3)
    ndrift.foreach { r =>
      val (n1, n2, nb, tv) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n1 > 0 && n2 > 0, r)
      // bitlength bins: >=1 bucket, and never more than 64 at ANY range
      assert(nb >= 1 && nb <= 64L, r)
      assert(tv >= 0L && tv <= 1000L, r)
    }
    val ord = Tables.orders(spark, dir)
    val r = ndrift.find(r => r.getString(0) == "orders").get
    assert(r.getLong(2) + r.getLong(3) === ord.count())
  }

  test("numeric drift recount: orders.o_totalprice from raw values") {
    val raw = Tables.orders(spark, dir)
      .select($"o_totalprice", ($"o_orderkey" % 2 === 0).as("a"))
      .as[(Double, Boolean)].collect()
    def bucket(v: Double): Long =
      java.lang.Long.toBinaryString(math.floor(v * 100).toLong + 1L)
        .length.toLong
    val n1 = raw.count(_._2).toLong
    val n2 = raw.count(!_._2).toLong
    val hist = raw.groupBy(t => bucket(t._1)).map { case (_, xs) =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    val l1x = hist.map { case (c1, c2) => (c1 * n2 - c2 * n1).abs }.sum
    val r = ndrift.find(r => r.getString(0) == "orders").get
    assert(r.getLong(4) === hist.size.toLong)
    assert(r.getLong(5) === (1000L * l1x) / (2L * n1 * n2))
  }

  private lazy val samples = Quality.violationSamples(spark, dir).collect()

  test("violation samples: exactly min(5, violations), smallest keys") {
    // independent recount of the two checks the corpus actually violates
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    def liKey = concat($"l_orderkey".cast("string"), lit(":"),
      $"l_linenumber".cast("string"))
    val expected = Map(
      "implies_return_final" -> li
        .filter($"l_returnflag".isin("R", "A") && $"l_linestatus" =!= "F")
        .select(liKey.as("k")).as[String].collect().sorted.take(5),
      "order_before_ship" -> li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .filter($"l_shipdate" < $"o_orderdate")
        .select(liKey.as("k")).as[String].collect().sorted.take(5))
    val byId = samples.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSeq }
    // every green check contributes NO rows; the violated ones exactly
    // their 5 smallest keys, in order
    assert(byId.keySet === expected.keySet)
    expected.foreach { case (id, keys) =>
      assert(byId(id) === keys.toSeq, id)
    }
  }

  test("violation samples agree with the constraint battery's n_bad") {
    // shared check ids must be consistent: rows sampled iff n_bad > 0
    val consBad = cons.map(r => r.getString(0) -> r.getLong(3)).toMap
    val sampled = samples.map(_.getString(0)).toSet
    for (id <- Seq("range_l_quantity", "ri_orders_customer",
        "order_before_ship") if consBad.contains(id)) {
      assert(sampled.contains(id) === (consBad(id) > 0L), id)
    }
  }

  test("temporal rule recount: order_before_ship over the natural join") {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    val bad = j.filter($"l_shipdate" < $"o_orderdate").count()
    val r = check("order_before_ship")
    assert(r.getLong(3) === bad)
    assert(r.getLong(2) === j.count())
  }
}
