package graft

import org.apache.spark.sql.SparkSession

/** One-off probe main for the BPE trainer forms (args: form dir rounds). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val form = args(0)
    val dir = args(1)
    val rounds = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = form match {
      case "replace" => graft.operators.TextOps.bpeTrain(s, dir, rounds)
      case _ => graft.operators.TextOps.bpeTrainIncremental(s, dir, rounds)
    }
    val n = df.count()
    println(s"""{"probe":"bpe_$form","rounds":$rounds,"sec":${(System.nanoTime - t0) / 1e9},"rows":$n}""")
    s.stop()
  }
}
