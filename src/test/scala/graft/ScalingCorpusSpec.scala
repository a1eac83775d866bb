package graft

import org.scalatest.funsuite.AnyFunSuite

/** The v4 sharded-corpus suffix contract (PLANS.md s4 finding #2 / VERDICT
  * r13 item 2): cross-shard tokens must be UNEQUAL IN tokenCode SPACE —
  * (first-3, length, last-char) — for up to 100 shards. With equal-length
  * "s"+c suffixes that reduces to: the per-shard character is distinct
  * across all shards and its codepoint stays a valid base-256 digit.
  * Verified here as the pure-law half; the Spark half (the scaled corpus
  * itself) is exercised by the ×100 ScalingBench probes.
  */
class ScalingCorpusSpec extends AnyFunSuite {

  test("shard suffix alphabet: 100 distinct sub-256 non-space chars") {
    assert(ScalingBench.shardSuffixContractHolds(100))
  }

  test("first ten shards keep the v3 digit suffixes (cache compatibility)") {
    // byte-identical ≤10-shard corpora are what lets pre-v4 caches stay
    // valid; the alphabet must therefore start "0123456789"
    assert(ScalingBench.shardAlphabet.take(10) == "0123456789")
  }
}
