package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Join-strategy hints: the user-facing control surface for overriding the
  * planner's strategy choice when its estimates are wrong at scale (a
  * "small" side that isn't, a broadcast that would OOM an executor, a
  * shuffle-hash that beats sort-merge on pre-sorted-hostile data). Each
  * test pins that the hint actually steers the physical plan AND that the
  * result is unchanged — a hint must never change semantics.
  */
class JoinHintSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val orders = Tables.orders(spark, dir)
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  private lazy val customer = Tables.customer(spark, dir)
    .select(col("c_custkey"), col("c_mktsegment"))

  private def joined(c: org.apache.spark.sql.DataFrame) =
    orders.join(c, col("o_custkey") === col("c_custkey"))

  test("merge hint forces sort-merge over the default broadcast") {
    val unhinted = joined(customer)
    assert(plan(unhinted).contains("BroadcastHashJoin"),
      "precondition: small dim should broadcast by default")
    val hinted = joined(customer.hint("merge"))
    assert(plan(hinted).contains("SortMergeJoin"), plan(hinted).take(1200))
    assert(hinted.count() == unhinted.count())
  }

  test("shuffle_hash hint forces a shuffled hash join") {
    val hinted = joined(customer.hint("shuffle_hash"))
    assert(plan(hinted).contains("ShuffledHashJoin"), plan(hinted).take(1200))
    assert(hinted.count() == joined(customer).count())
  }

  test("broadcast hint forces broadcast even when autoBroadcast is disabled") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val unhinted = joined(customer)
      assert(!plan(unhinted).contains("BroadcastHashJoin"),
        "precondition: threshold -1 should disable auto broadcast")
      val hinted = joined(broadcast(customer))
      assert(plan(hinted).contains("BroadcastHashJoin"), plan(hinted).take(1200))
      assert(hinted.count() == unhinted.count())
    } finally spark.conf.set(key, prev)
  }
}
