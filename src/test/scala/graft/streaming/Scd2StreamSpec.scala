package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Events

/** Streaming SCD2 laws (Scd2Stream.scala): for any order-preserving
  * slicing of the event log into micro-batches, the maintained dimension
  * is bit-identical to the batch rebuild (Events.scd2Build); a state
  * continuing across a batch boundary is ABSORBED into the open version
  * (no spurious split); and the end-to-end foreachBatch stream converges
  * on real files.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select($"user_id", $"ts", $"event_id", $"event_type")

  private type DimRow =
    (Long, Long, String, Timestamp, Option[Timestamp], Boolean)

  private def rows(df: DataFrame): Seq[DimRow] =
    df.select($"user_id", $"version_no", $"state", $"valid_from",
        $"valid_to", $"is_current")
      .as[DimRow].collect().toSeq.sortBy(r => (r._1, r._2))

  private lazy val expected: Seq[DimRow] =
    rows(Events.scd2Build(spark, sf("sf0.001")))

  /** Slice the log into n contiguous ts-ranges (order-preserving for
    * every user) and fold them through the sink sequentially.
    */
  private def foldSlices(n: Int): Seq[DimRow] = {
    val all = events.orderBy($"ts", $"event_id").collect()
    val sink = new Scd2Stream.Scd2Sink
    all.grouped(math.max(1, (all.length + n - 1) / n)).zipWithIndex
      .foreach { case (chunk, i) =>
        val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toSeq, 2), events.schema)
        sink.merge(batch, i.toLong)
      }
    rows(sink.dim.get)
  }

  test("one batch reproduces the batch rebuild bit-for-bit") {
    assert(foldSlices(1) === expected)
  }

  test("dimension is invariant to slicing: 3 and 7 micro-batches") {
    assert(foldSlices(3) === expected)
    assert(foldSlices(7) === expected)
  }

  test("a state continuing across the boundary is absorbed, not split") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val sink = new Scd2Stream.Scd2Sink
    sink.merge(Seq((1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type"), 0L)
    sink.merge(Seq((1L, ts(3), 12L, "view"), (1L, ts(4), 13L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type"), 1L)
    val got = rows(sink.dim.get)
    assert(got.map(_._3) === Seq("view", "click"))
    assert(got.map(_._2) === Seq(1L, 2L))
    // the absorbed open version still starts at its ORIGINAL valid_from
    // and closes exactly where the new state begins
    assert(got.head._4 === ts(1) && got.head._5.contains(ts(4)))
    assert(got.last._6 && got.last._5.isEmpty)
  }

  test("end-to-end foreachBatch stream over files converges") {
    val dir = Files.createTempDirectory("graft-scd2").toFile.getAbsolutePath
    events.coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = events.schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val sink = new Scd2Stream.Scd2Sink
    val q = Scd2Stream.toScd2Sink(stream, sink).start()
    q.awaitTermination()
    assert(rows(sink.dim.get) === expected)
  }
}
