package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: run a SparkEntry query once and print its JOB and STAGE
  * counts — the weather-independent cost metric for round-latency-bound
  * iterative operators (Borůvka, star contraction, BSP loops), where
  * wall-clock ≈ jobs × fixed scheduling latency and co-tenant noise can
  * mask a 2× structural change. Usage:
  * `runMain graft.JobCount <query> [sfDir]`.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("graph_mst")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var jobs = 0
    var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        synchronized { stages += 1 }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(q)(spark, dir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    // listener events are posted asynchronously; settle before reading
    // (listenerBus.waitUntilEmpty is private[spark]; a short sleep after
    // the action returns is enough for a diagnostic count)
    Thread.sleep(1000)
    println(f"""{"query":"$q","rows":$n,"jobs":$jobs,"stages":$stages,"sec":$secs%.3f}""")
    spark.stop()
  }
}
