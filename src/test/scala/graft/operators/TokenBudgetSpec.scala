package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tokenBudget (budget-constrained curation): the kept set must fit the
  * budget, be quality-downward-closed (a threshold rule), and be maximal
  * at bucket granularity (adding the next bucket would overflow).
  */
class TokenBudgetSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("tokenBudget keeps a maximal quality-prefix within the budget") {
    import spark.implicits._
    val out = TextOps.tokenBudget(spark, dir).localCheckpoint(true)
    val total = out.agg(sum($"n_tokens")).head().getLong(0)
    val budget = total / 10

    val kept = out.filter($"keep" === 1L)
    val keptMass = kept.agg(coalesce(sum($"n_tokens"), lit(0L)))
      .head().getLong(0)
    assert(keptMass <= budget, s"kept $keptMass > budget $budget")

    // threshold rule: every kept doc outranks every dropped doc
    val minKept = kept.agg(min($"ttr_permille")).head().getLong(0)
    val maxDrop = out.filter($"keep" === 0L)
      .agg(max($"ttr_permille")).head().getLong(0)
    assert(minKept > maxDrop)

    // maximality at bucket granularity: the best excluded bucket would
    // overflow the budget
    val nextMass = out.filter($"keep" === 0L && $"ttr_permille" === maxDrop)
      .agg(sum($"n_tokens")).head().getLong(0)
    assert(keptMass + nextMass > budget,
      s"bucket $maxDrop (mass $nextMass) would still fit: " +
        s"$keptMass + $nextMass <= $budget")
  }
}
