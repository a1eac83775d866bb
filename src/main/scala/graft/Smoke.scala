package graft

import org.apache.spark.sql.SparkSession

/** Local smoke harness mirroring the driver's t1 check: `entry` must return
  * rows > 0 on sf0.001. Optionally runs one named query against a given dir:
  * `runMain graft.Smoke [queryName sfDir]`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array(name, sfDir) =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(s"SMOKE $name rows=" + df.count())
        df.show(20, truncate = false)
        df.explain("formatted")
      case _ =>
        val df = SparkEntry.entry(spark)
        println("ENTRY_ROWS=" + df.count())
        df.show(5, truncate = false)
    }
    spark.stop()
  }
}
