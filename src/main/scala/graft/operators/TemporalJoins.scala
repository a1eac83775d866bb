package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators — as-of and range joins, composed from built-ins
  * per the extension preference order (compose > custom Expression > custom
  * plan): both have exact declarative formulations that Catalyst pipelines
  * well, so no custom plan node is warranted.
  */
object TemporalJoins {

  /** As-of join: for each 'purchase' event, the latest 'click' by the same
    * user at or before it.
    *
    * Composition: union both sides tagged, one window pass per user ordered
    * by time carrying the last click forward (`last(ignoreNulls)` over an
    * unbounded-preceding frame), keep the purchase rows. ONE shuffle on
    * user_id and a streaming frame — strictly better at scale than the
    * naive inequality join (which is O(clicks × purchases) per user).
    * Ties (click.ts == purchase.ts): the click sorts before the purchase
    * (side tag ascending), so "at or before" includes same-instant clicks —
    * matching ASOF JOIN's `<=` semantics.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", lit(0).as("side"),
        $"event_id".as("click_id"), lit(null).cast("long").as("purchase_id"),
        lit(null).cast("double").as("purchase_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("side"),
        lit(null).cast("long").as("click_id"), $"event_id".as("purchase_id"),
        $"value".as("purchase_value"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"side", coalesce($"click_id", $"purchase_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click", last($"click_id", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"user_id", $"purchase_id",
        round($"purchase_value", 2).as("purchase_value"),
        coalesce($"asof_click", lit(-1L)).as("asof_click"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** DuckDB oracle via correlated max over the inequality — small at sf0.01
    * and unambiguous; click ties on ts broken by max event_id? No: the
    * Spark side carries the LAST click in (ts, click_id) order, so the
    * oracle picks, among clicks with the max ts <= purchase ts, the max
    * click_id.
    */
  val asofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, ts, event_id AS purchase_id,
      |         value AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |best AS (
      |  SELECT p.purchase_id AS bpid,
      |    (SELECT c.click_id FROM clicks c
      |     WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |     ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS asof_click
      |  FROM purch p)
      |SELECT p.user_id, p.purchase_id,
      |  round(p.purchase_value, 2) AS purchase_value,
      |  coalesce(b.asof_click, -1) AS asof_click
      |FROM purch p JOIN best b ON p.purchase_id = b.bpid
      |ORDER BY user_id, purchase_id""".stripMargin

  /** Range (interval) join: each order matched to its quarter bucket from a
    * derived calendar of [start, end) intervals. The calendar side is tiny
    * and broadcast, so the interval predicate evaluates as a broadcast
    * nested-loop — the right plan when one side is a handful of intervals.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quarters = s.range(0, 40).select(
      (lit(1995) + ($"id" / 4).cast("int")).as("qy"),
      (($"id" % 4) + 1).cast("int").as("qq"))
      .withColumn("qstart",
        to_timestamp(concat($"qy", lit("-"),
          lpad((($"qq" - 1) * 3 + 1).cast("string"), 2, "0"), lit("-01"))))
      .withColumn("qend", add_months($"qstart", 3).cast("timestamp"))
    val ord = Tables.orders(s, dir)
      .filter($"o_custkey" % 25 === 0)
      .select($"o_orderkey", $"o_orderdate", round($"o_totalprice", 2).as("total"))
    ord.join(broadcast(quarters),
        $"o_orderdate" >= $"qstart" && $"o_orderdate" < $"qend")
      .select($"o_orderkey",
        concat($"qy", lit("Q"), $"qq").as("quarter"), $"total")
      .orderBy($"o_orderkey")
  }

  val rangeJoinSql: String =
    """WITH quarters AS (
      |  SELECT 1995 + (i // 4) AS qy, (i % 4) + 1 AS qq,
      |    make_timestamp(1995 + (i // 4)::INT, ((i % 4) * 3 + 1)::INT,
      |                   1, 0, 0, 0.0) AS qstart,
      |    make_timestamp(1995 + (i // 4)::INT, ((i % 4) * 3 + 1)::INT,
      |                   1, 0, 0, 0.0) + INTERVAL 3 MONTH AS qend
      |  FROM range(40) t(i))
      |SELECT o_orderkey, qy || 'Q' || qq AS quarter,
      |  round(o_totalprice, 2) AS total
      |FROM orders JOIN quarters
      |  ON o_orderdate >= qstart AND o_orderdate < qend
      |WHERE o_custkey % 25 = 0
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_asof_join" -> asofJoin _,
    "q25_range_join" -> rangeJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q24_asof_join" -> asofJoinSql,
    "q25_range_join" -> rangeJoinSql,
  )
}
