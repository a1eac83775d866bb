package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-evidence snapshotter (VERDICT r16 #3): writes, for each named
  * query, its `.explain("formatted")` output — the FINAL frame plus every
  * pinned segment's PRE-checkpoint plan (via [[Pin.audited]], so the
  * operators hidden behind eager localCheckpoints are visible too) — to
  * `<outDir>/<query><suffix>.txt`. Run before and after an optimization
  * (`_before` / `_after` suffixes) so the judge can diff Exchange counts,
  * join strategies and PushedFilters against the code claims.
  *
  * Usage: `runMain graft.PlanSnap <outDir> <suffix> q1 q2 ...`
  * (data dir from SPARK_GRAFT_SF_DIR, cores from SPARK_GRAFT_CPUS — plans
  * are dumped at the bench scale so size-estimate-driven strategy choices
  * match what the bench actually executes).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val qs = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    for (q <- qs) {
      val sb = new StringBuilder
      var seg = 0
      val df = Pin.audited { pre =>
        seg += 1
        sb ++= s"\n=== pinned segment $seg (pre-checkpoint plan) ===\n"
        sb ++= pre.queryExecution.explainString(mode)
      } { SparkEntry.queries(q)(spark, dir) }
      val out = s"=== $q: final frame ===\n" +
        df.queryExecution.explainString(mode) + sb.toString
      Files.write(Paths.get(outDir, s"$q$suffix.txt"),
        out.getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/$q$suffix.txt (${seg} pinned segments)")
    }
    spark.stop()
  }
}
