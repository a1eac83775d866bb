package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** pplBuckets: the CCNet tercile action must agree with the surprisal
  * scores it rides on, cut each language into near-equal thirds, and keep
  * the buckets order-consistent (every head score ≤ every middle ≤ every
  * tail within a language).
  */
class PplBucketsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("terciles are balanced, order-consistent, and score-faithful") {
    import spark.implicits._
    val out = TextOps.pplBuckets(spark, dir).localCheckpoint(true)

    // scores match textSurprisal exactly (same LM, same quantization)
    val scores = TextOps.textSurprisal(spark, dir)
      .select($"doc_id", $"mean_millibits".as("ref"))
    assert(out.join(scores, Seq("doc_id"))
      .filter($"mean_millibits" =!= $"ref").count() == 0)

    // bucket sizes within a language differ by at most one
    val sizes = out.groupBy($"lang", $"bucket").agg(count(lit(1)).as("n"))
      .groupBy($"lang").agg(max($"n").as("mx"), min($"n").as("mn"),
        countDistinct($"bucket").as("nb"))
    assert(sizes.filter($"mx" - $"mn" > 1 || $"nb" =!= 3).count() == 0)

    // order consistency: max(head) <= min(middle) ... on (score, doc_id)
    // means no head doc outranks a middle doc; at the score level the
    // boundary can tie, so compare the packed order key
    val key = $"mean_millibits" * 100000L + $"doc_id"
    val bounds = out.select($"lang", $"bucket", key.as("k"))
      .groupBy($"lang", $"bucket").agg(min($"k").as("lo"), max($"k").as("hi"))
    val wide = bounds.groupBy($"lang").pivot("bucket",
        Seq("head", "middle", "tail"))
      .agg(first($"lo").as("lo"), first($"hi").as("hi"))
    assert(wide.filter($"head_hi" > $"middle_lo" ||
      $"middle_hi" > $"tail_lo").count() == 0)
  }
}
