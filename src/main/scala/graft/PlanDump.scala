package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostic: prints, for each query name passed as an argument,
  * the executed-plan nested-loop/cartesian count and the matching plan
  * lines — the manual companion to PlanGuardSpec's mechanical sweep
  * (usage: `sbt "runMain graft.PlanDump ev_rfm sim_ivf_topk"`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(s, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $name BNLJ count: " +
        "BroadcastNestedLoopJoin|CartesianProduct".r.findAllMatchIn(p).length)
      println(p.split("\n").filter(l => l.contains("NestedLoop") ||
        l.contains("Cartesian")).mkString("\n"))
    }
    s.stop()
  }
}
