package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming Misra–Gries laws (FreqStream.scala) over the sf0.001 token
  * stream: summary size ≤ k, every estimate an undercount by at most
  * n/(k+1), no false dismissal of true heavy hitters — each under
  * multiple micro-batch slicings (the bounds are slicing-invariant even
  * though the candidate SET is not), compression non-vacuity (the
  * 31-word vocabulary forces evictions at k = 8), and the `guaranteed`
  * read's soundness.
  */
class FreqStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks: DataFrame = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select(explode(split($"text", " ")).as("w"))

  private lazy val exact: Map[String, Long] =
    toks.groupBy($"w").count().as[(String, Long)].collect().toMap
  private lazy val n: Long = exact.values.sum

  private def runStream(k: Int, nFiles: Int): FreqStream.FreqSink = {
    val dir = Files.createTempDirectory("graft-freq").toFile.getAbsolutePath
    toks.repartition(nFiles).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = new FreqStream.FreqSink(k)
    FreqStream.toFreqSink(stream, sink).start().awaitTermination()
    sink
  }

  private def checkLaws(sink: FreqStream.FreqSink, k: Int): Unit = {
    assert(sink.processed === n)
    assert(sink.state.size <= k)
    val bound = n / (k + 1)
    // undercount, bounded — for every word in the vocabulary
    exact.foreach { case (w, t) =>
      val est = sink.state.getOrElse(w, 0L)
      assert(est <= t, s"$w overestimated: $est > $t")
      assert(t - est <= bound, s"$w undercount ${t - est} > $bound")
    }
    // nothing outside the vocabulary ever appears
    assert(sink.state.keySet.subsetOf(exact.keySet))
    // no false dismissal: every true heavy hitter is present
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(sink.state.contains(w), s"true heavy hitter $w dismissed")
    }
    // guaranteed read is sound: only true heavy hitters
    sink.guaranteed.foreach { case (w, _) =>
      assert(exact(w) > bound, s"guaranteed $w is not a true hitter")
    }
  }

  test("k=8 over one batch: laws hold, compression actually evicted") {
    val sink = runStream(8, 1)
    checkLaws(sink, 8)
    // the 31-word vocabulary cannot fit in 8 entries — evictions happened
    assert(sink.state.size < exact.size)
    // this corpus is near-uniform (top word 984 of 27,939 < n/9): there
    // is NO true heavy hitter, and the sound `guaranteed` read says so
    assert(exact.values.max <= n / 9)
    assert(sink.guaranteed.isEmpty)
  }

  test("injected hot token: detected, guaranteed, never dismissed") {
    // make the hitter laws NON-vacuous: a skewed stream with one token
    // at ~25% mass (true heavy hitter at k=8 by three times the bound)
    val dir = Files.createTempDirectory("graft-freqh").toFile.getAbsolutePath
    val hot = spark.range(9000L).select(lit("hotword").as("w"))
    toks.unionByName(hot).repartition(6)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = new FreqStream.FreqSink(8)
    FreqStream.toFreqSink(stream, sink).start().awaitTermination()
    val total = n + 9000L
    assert(sink.processed === total)
    assert(sink.state.size <= 8)
    // the hot token is a true hitter (9000 > total/9) -> must be present
    // AND provably heavy from its estimate alone
    assert(sink.state.contains("hotword"))
    val est = sink.state("hotword")
    assert(est <= 9000L && 9000L - est <= total / 9)
    assert(sink.guaranteed.map(_._1).contains("hotword"))
  }

  test("k=8 laws are invariant to slicing (5 and 11 one-file triggers)") {
    checkLaws(runStream(8, 5), 8)
    checkLaws(runStream(8, 11), 8)
  }

  test("k=16 across slicings; larger k only tightens the bound") {
    val s1 = runStream(16, 7)
    checkLaws(s1, 16)
    // sanity on the bound arithmetic: n/(17) < n/9
    assert(n / 17 < n / 9)
  }

  test("hand fold: merge + compression arithmetic on a known stream") {
    val sink = new FreqStream.FreqSink(2)
    sink.merge(Seq("a", "a", "a", "b", "b", "c").toDF("w"), 0L)
    // k=2: one summary can hold a,b,c only after compression; exact MG
    // semantics are candidate-set, so just check the laws by hand
    assert(sink.processed === 6L)
    assert(sink.state.size <= 2)
    val estA = sink.state.getOrElse("a", 0L)
    assert(estA >= 3L - 6L / 3 && estA <= 3L)
    sink.merge(Seq("a", "d", "d", "d", "d", "d").toDF("w"), 1L)
    assert(sink.processed === 12L)
    assert(sink.state.size <= 2)
    // d: true 5 of 12, bound 12/3 = 4 -> d must survive the fold
    assert(sink.state.contains("d"))
    assert(sink.state("d") <= 5L && 5L - sink.state("d") <= 4L)
  }
}
