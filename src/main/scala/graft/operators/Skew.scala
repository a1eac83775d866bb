package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation operators (builder prompt: "skewed keys → salting or AQE
  * skew-join").
  *
  * The token stream over `documents` is the engine's most skewed workload:
  * a 31-word vocabulary over millions of rows means every key is hot. The
  * salted two-stage aggregation below bounds any single reducer's input to
  * |input|/salts regardless of key skew — the classic fix when AQE's
  * skew-join splitting doesn't apply (aggregations, not joins).
  *
  * The salt must be DETERMINISTIC (derived from row content, not
  * rand()/partition id) so results are reproducible and retries are safe —
  * the same determinism discipline as the Aria engine.
  */
object Skew {

  /** Two-stage salted count/sum: stage 1 aggregates (key, salt) partials
    * (salts × |keys| groups, evenly spread), stage 2 merges per key.
    * Result is exactly the plain groupBy — the oracle doesn't change.
    */
  def saltedAgg(df: DataFrame, keyCol: Column, weight: Column, salts: Int,
      saltSource: Column): (DataFrame, DataFrame) = {
    val salted = df.select(keyCol.as("k"), weight.as("v"),
      pmod(crc32(saltSource.cast("string")), lit(salts)).as("salt"))
    val partial = salted.groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    val merged = partial.groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("s"))
    (partial, merged)
  }

  /** Token frequencies over documents via salted two-stage aggregation;
    * output equals a plain GROUP BY (which is exactly the DuckDB oracle).
    */
  def skewSaltedTokenCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
    val (_, merged) = saltedAgg(tok, $"w", lit(1L), salts = 16,
      saltSource = $"doc_id")
    merged.select($"k".as("w"), $"n".as("n_occurrences"))
      .orderBy($"w")
  }

  val skewSaltedTokenCountsSql: String =
    """SELECT w, count(*) AS n_occurrences
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |      FROM documents) t
      |GROUP BY w ORDER BY w""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> skewSaltedTokenCounts _,
  )

  val oracles: Map[String, String] = Map(
    "skew_salted_agg" -> skewSaltedTokenCountsSql,
  )
}
