package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** softTokens: conserves docs and raw tokens against the corpus, the
  * effective mass never exceeds the raw mass (weights ≤ 1000), and the
  * per-language aggregate matches a direct recomposition from the
  * soft-weight manifest.
  */
class SoftTokensSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("softTokens conserve and agree with the weight manifest") {
    import spark.implicits._
    val st = TextOps.softTokens(spark, dir).localCheckpoint(true)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"))
    assert(st.agg(sum($"n_docs")).head().getLong(0) == docs.count())
    assert(st.agg(sum($"raw_tokens")).head().getLong(0) ==
      docs.agg(sum($"n_tokens")).head().getLong(0))
    // effective ≤ raw·1000 (weights capped at 1000 permille)
    assert(st.filter($"eff_tokens_milli" > $"raw_tokens" * 1000L).count() == 0)
    assert(st.filter($"discount_pm" < 0 || $"discount_pm" > 1000).count() == 0)
    // recomposition from the manifest
    val manifest = TextOps.softWeights(spark, dir)
      .select($"doc_id", $"weight_permille")
    val recomposed = docs.join(manifest, "doc_id")
      .groupBy($"lang")
      .agg(sum($"n_tokens" * $"weight_permille").as("eff2"))
    assert(st.join(recomposed, "lang")
      .filter($"eff_tokens_milli" =!= $"eff2").count() == 0)
  }
}
