package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

/** Streaming bottom-k reservoir laws (SampleStream.scala): the
  * maintained sample must be BIT-IDENTICAL to the batch
  * `sample_reservoir` query over the same corpus under EVERY micro-batch
  * slicing (min-k is a semilattice — equality, not bounds), and the
  * driver merge must handle re-delivery (idempotence: merging the same
  * batch twice changes nothing).
  */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select($"lang", $"doc_id")

  private lazy val expected: Seq[(String, Long, Long)] =
    Sketches.reservoirSample(spark, sf("sf0.001"))
      .select($"lang", $"doc_id", $"hh")
      .as[(String, Long, Long)].collect().toSeq

  private def runStream(nFiles: Int): SampleStream.ReservoirSink = {
    val dir = Files.createTempDirectory("graft-rsv").toFile.getAbsolutePath
    docs.repartition(nFiles).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = new SampleStream.ReservoirSink(20)
    SampleStream.toReservoirSink(stream, sink).start().awaitTermination()
    sink
  }

  test("single batch is bit-identical to the batch reservoir query") {
    assert(runStream(1).sample === expected)
  }

  test("sample is bit-identical under 4- and 9-file slicings") {
    assert(runStream(4).sample === expected)
    assert(runStream(9).sample === expected)
  }

  test("merge is idempotent under batch re-delivery") {
    val sink = new SampleStream.ReservoirSink(20)
    val b = docs.limit(100)
    sink.merge(b, 0L)
    val once = sink.sample
    sink.merge(b, 0L) // at-least-once delivery replays the batch
    assert(sink.sample === once)
  }
}
