package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 scalar quantization: top-k shape laws and the recall contract
  * against the exact-cosine baseline.
  */
class SqAnnSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("sqTopK emits 3 ranked candidates per query with bounded scores") {
    import spark.implicits._
    val top = Similarity.sqTopK(spark, dir).localCheckpoint(true)
    val qs = top.select($"qid").distinct().count()
    assert(qs == 10)
    assert(top.count() == qs * 3)
    // ranks contiguous 1..3 per query
    assert(top.groupBy($"qid").agg(sum($"rn").as("s"))
      .filter($"s" =!= 6L).count() == 0)
    // a quantized cosine stays a cosine (small rounding slack)
    assert(top.filter(abs($"cos_sq") > 1.01).count() == 0)
    // no self-matches
    assert(top.filter($"qid" === $"vec_id").count() == 0)
  }

  test("sqRecall reports 3 exact candidates per query and decent recall") {
    import spark.implicits._
    val rec = Similarity.sqRecall(spark, dir).localCheckpoint(true)
    assert(rec.count() == 10)
    assert(rec.filter($"n_exact" =!= 3L).count() == 0)
    assert(rec.filter($"n_hit" > $"n_exact").count() == 0)
    // int8 on 64-dim unit-scale vectors is a mild quantization: recall@3
    // should be high; 50% global floor guards against a broken scale/code
    // path without over-fitting the synthetic corpus
    val (hits, exact) = rec.agg(sum($"n_hit"), sum($"n_exact"))
      .as[(Long, Long)].head()
    assert(hits * 2 >= exact, s"recall too low: $hits/$exact")
  }
}
