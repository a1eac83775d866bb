package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Runtime bloom-filter join pruning: when a shuffle join's build side is
  * selective, Catalyst can inject a bloom-filter semi-filter onto the probe
  * side's scan, so most fact rows die before the exchange — at 100 TB this
  * is the difference between shuffling the whole fact table and shuffling
  * the ~matching fraction. The engine relies on the built-in
  * InjectRuntimeFilter rule; this spec pins the confs that arm it at our
  * scale and asserts both the injection and result equality.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val confs = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // local test data is far below the production-tuned size gates
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    // a broadcast join never needs the bloom filter; force the shuffle path
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("selective shuffle join injects a bloom filter on the probe side") {
    import spark.implicits._
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def joined = Tables.lineitem(spark, sf("sf0.01"))
        .join(Tables.orders(spark, sf("sf0.01"))
            .filter($"o_totalprice" > 400000.0),
          $"l_orderkey" === $"o_orderkey")
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter in:\n$optimized")
      // value-level equality, not just row count: a filter that dropped
      // one matching row and duplicated another would keep counts equal
      def fingerprint() = {
        val d = joined
        d.agg(count(lit(1)), bit_xor(xxhash64(d.columns.map(col): _*)))
          .collect().head
      }
      val withFilter = fingerprint()
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(fingerprint() == withFilter)
      assert(withFilter.getLong(0) > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
