package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming IVM laws (MvStream.scala): the maintained view must be
  * invariant to micro-batch slicing (counting-rule associativity), equal
  * the from-scratch aggregate of the net effective rows, and survive
  * out-of-order CDC where a delete is folded BEFORE its insert (the
  * transient-negative carry the read-time death filter exists for).
  */
class MvStreamSpec extends SparkSpec {
  import spark.implicits._

  // CDC day over sf0.001 orders: every order inserted; finished orders
  // with o_orderkey % 7 == 0 also deleted (arriving interleaved)
  private lazy val cdc: DataFrame = {
    val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select($"o_custkey".as("key"),
        round($"o_totalprice" * 100).cast("long").as("x"),
        $"o_orderstatus", $"o_orderkey")
    o.select($"key", $"x", lit(1).as("op"))
      .unionByName(o.filter($"o_orderstatus" === "F" && $"o_orderkey" % 7 === 0)
        .select($"key", $"x", lit(-1).as("op")))
  }

  private lazy val expected: Map[Long, (Long, Long)] = {
    val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .filter(!($"o_orderstatus" === "F" && $"o_orderkey" % 7 === 0))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("long")).as("s"))
    o.as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
  }

  private def runStream(nFiles: Int): Map[Long, (Long, Long)] = {
    val dir = Files.createTempDirectory("graft-mv").toFile.getAbsolutePath
    cdc.repartition(nFiles).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = new MvStream.MvSink("key")
    val q = MvStream.toMvSink(stream, sink).start()
    q.awaitTermination()
    sink.view.get.as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
  }

  test("single-batch stream equals the from-scratch aggregate") {
    assert(runStream(1) === expected)
  }

  test("view is invariant to micro-batch slicing (6 one-file triggers)") {
    assert(runStream(6) === expected)
  }

  test("a delete folded before its insert carries through a negative count") {
    val sink = new MvStream.MvSink("key")
    val delFirst = Seq((7L, 100L, -1)).toDF("key", "x", "op")
    val insLater = Seq((7L, 100L, 1), (7L, 250L, 1)).toDF("key", "x", "op")
    sink.merge(delFirst, 0L)
    // transient state: key 7 at n = -1 — must be carried, not filtered
    val mid = sink.state.get.as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(mid(7L) === ((-1L, -100L)))
    assert(sink.view.get.count() === 0L, "read-time view hides the carry")
    sink.merge(insLater, 1L)
    val fin = sink.view.get.as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(fin === Map(7L -> ((1L, 250L))))
  }
}
