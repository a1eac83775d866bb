package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skyline (Pareto-dominance) operator — rows not dominated by any other
  * row on the maximized dimensions (pattern from the retrieved corpus:
  * "Integration of Skyline Queries into Spark SQL", EDBT 2023; this is an
  * independent implementation of the classic two-phase algorithm).
  *
  * Scale design: dominance is a pairwise predicate, so the relational
  * formulation is an O(n²) inequality self-join. The two-phase algorithm
  * is exact and near-linear instead: each partition computes its LOCAL
  * skyline (non-dominated set, typically tiny), and only those survivors
  * are merged and reduced once more — the final pass input is bounded by
  * Σ|local skylines|, not n. mapPartitions is justified here (preference
  * order (d)): per-partition set-wise dominance has no efficient
  * expression in relational operators.
  */
object Skyline {

  /** b dominates a iff b ≥ a on every dim and > on at least one. */
  private def dominates(b: Array[Double], a: Array[Double]): Boolean = {
    var geAll = true
    var gtAny = false
    var i = 0
    while (i < a.length && geAll) {
      if (b(i) < a(i)) geAll = false
      else if (b(i) > a(i)) gtAny = true
      i += 1
    }
    geAll && gtAny
  }

  private def localSkyline(dimIdx: Array[Int])(rows: Iterator[Row]): Iterator[Row] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
    rows.foreach { r =>
      val d = dimIdx.map(i => r.getDouble(i))
      if (!kept.exists { case (kd, _) => dominates(kd, d) }) {
        kept.filterInPlace { case (kd, _) => !dominates(d, kd) }
        kept += ((d, r))
      }
    }
    kept.iterator.map(_._2)
  }

  /** Exact skyline maximizing `dimCols` (must be DoubleType columns). */
  def skyline(df: DataFrame, dimCols: Seq[String]): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = dimCols.map(c => df.columns.indexOf(c)).toArray
    require(idx.forall(_ >= 0), s"missing dims in ${df.columns.toSeq}")
    val local = df.mapPartitions(localSkyline(idx))(enc)
    // global merge: input is the union of (small) local skylines
    local.repartition(1).mapPartitions(localSkyline(idx))(enc)
  }

  /** Skyline of orders (every 10th customer): maximize (total, order day).
    * The DuckDB oracle is the naive NOT EXISTS dominance test — exact
    * ground truth for the two-phase algorithm.
    */
  def skylineOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .filter($"o_custkey" % 10 === 0)
      .select($"o_orderkey",
        round($"o_totalprice", 2).as("total"),
        datediff($"o_orderdate", lit("1970-01-01").cast("date"))
          .cast("double").as("oday"))
    skyline(base, Seq("total", "oday"))
      .select($"o_orderkey", $"total", $"oday".cast("long").as("oday"))
      .orderBy($"o_orderkey")
  }

  val skylineOrdersSql: String =
    """WITH s AS (
      |  SELECT o_orderkey, round(o_totalprice, 2) AS total,
      |    date_diff('day', DATE '1970-01-01', o_orderdate) AS oday
      |  FROM orders WHERE o_custkey % 10 = 0)
      |SELECT o_orderkey, total, oday::BIGINT AS oday FROM s a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM s b
      |  WHERE b.total >= a.total AND b.oday >= a.oday
      |    AND (b.total > a.total OR b.oday > a.oday))
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skyline_orders" -> skylineOrders _,
  )

  val oracles: Map[String, String] = Map(
    "skyline_orders" -> skylineOrdersSql,
  )
}
