package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.Pin.PinOps

/** Market-basket affinity analysis (Agrawal–Imieliński–Swami, SIGMOD'93
  * association rules) — the order-level "frequently bought together"
  * battery a retail/recommendation pipeline runs over transaction logs.
  * The reference engine has no recommendation surface; this extends the
  * analytics inventory the way SURVEY.md §2.2 mandates (COVERAGE.md
  * "affinity" family).
  *
  * Scale shape, by construction:
  *  - the pair generator is a BASKET-KEYED self-join (equi on the order
  *    key): candidate volume is Σ_baskets |b|² — linear in rows whenever
  *    basket sizes are bounded (they are: an order has ≤7 lines in TPC-H,
  *    ≤13 distinct parts on this corpus), never corpus-quadratic. This is
  *    the same volume argument as the LSH bucket join, with the basket id
  *    playing the bucket role — a natural key, so no signature pass.
  *  - min-support pruning (s_ab ≥ 2) happens in the same aggregation that
  *    counts pairs — map-side partials fold duplicate pair instances
  *    before the exchange.
  *  - per-item supports are a second keyed aggregation over the SAME
  *    deduplicated item frame; the final enrich joins are key-equi
  *    (broadcastable while the item vocabulary fits, shuffled otherwise).
  *  - the single 1-row basket-total frame rides the house 1-row
  *    broadcast-cross shape (PlanGuardSpec whitelist).
  *
  * Everything stays in exact integers: confidence and lift ship as
  * permille via floor division with ALL-POSITIVE operands (support
  * counts), so Spark's truncating `div` and DuckDB's flooring `//`
  * agree. Headroom: 1000·s_ab·n_orders < 2⁶³ holds to ~10¹⁵ basket-pair
  * instances — beyond that ship the raw supports and divide downstream.
  */
object Affinity {

  /** Deduplicated basket-membership frame (order o, part p) — basket =
    * distinct parts per order (a part twice in one order is one basket
    * membership, per the standard itemset model). Shared by
    * [[marketBasket]] and [[itemCosine]].
    */
  private def itemsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
      .distinct()
    // Deliberately NOT pinned despite 3-4 consumers: a checkpoint of the
    // row-count-sized frame competes with the pair join's aggregation for
    // unified memory — measured at the ×100 probe (60M rows), the pinned
    // form dies with AGGREGATE_OUT_OF_MEMORY while the recompute form
    // finishes in 39 s. The recompute is CPU-for-memory, and on a real
    // cluster AQE exchange reuse dedups the repeated dedup-shuffle anyway
    // (pins are for ITERATIVE chains and bounded frames, not for
    // corpus-sized frames a join is about to stream).
  }

  /** Pair supports s_ab (≥ 2) from the basket-keyed self-join, a < b. */
  private def pairsOf(items: DataFrame): DataFrame = {
    import items.sparkSession.implicits._
    items.select($"o", $"p".as("pa"))
      .join(items.select($"o", $"p".as("pb")), Seq("o"))
      .where($"pa" < $"pb")
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("s_ab"))
      .where($"s_ab" >= 2L)
  }

  /** Top-20 association pairs by lift over order baskets: for parts a<b,
    * support s_ab = #orders containing both, per-item supports s_a/s_b,
    * confidence(a→b) = s_ab/s_a and lift = N·s_ab/(s_a·s_b) in permille.
    * Deterministic total order: lift desc, support desc, then the pair.
    */
  def marketBasket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = itemsOf(s, dir)
    val nOrders = items.agg(countDistinct($"o").as("n_orders"))
    val supp = items.groupBy($"p").agg(count(lit(1)).as("s"))
    pairsOf(items)
      .join(supp.select($"p".as("pa"), $"s".as("s_a")), Seq("pa"))
      .join(supp.select($"p".as("pb"), $"s".as("s_b")), Seq("pb"))
      .crossJoin(nOrders)
      .select($"pa", $"pb", $"s_ab", $"s_a", $"s_b",
        expr("(1000 * s_ab) div s_a").as("conf_pm"),
        expr("(1000 * s_ab * n_orders) div (s_a * s_b)").as("lift_pm"))
      .orderBy($"lift_pm".desc, $"s_ab".desc, $"pa", $"pb")
      .limit(20)
  }

  val marketBasketSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM items),
      |supp AS (SELECT p, count(*)::BIGINT AS s FROM items GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS s_ab
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pa, pb, s_ab, sa.s AS s_a, sb.s AS s_b,
      |  ((1000 * s_ab) // sa.s)::BIGINT AS conf_pm,
      |  ((1000 * s_ab * n_orders) // (sa.s * sb.s))::BIGINT AS lift_pm
      |FROM pairs
      |JOIN supp sa ON pa = sa.p
      |JOIN supp sb ON pb = sb.p
      |CROSS JOIN n
      |ORDER BY lift_pm DESC, s_ab DESC, pa, pb LIMIT 20""".stripMargin

  /** Per-item top-3 co-purchase recommendations (Sarwar et al., WWW'01
    * item-based collaborative filtering): for every item with a
    * qualifying pair, the 3 neighbors with the highest cosine similarity
    * over basket-membership vectors — cos(a,b) = s_ab/√(s_a·s_b), kept
    * exact as cos²·10⁶ = (10⁶·s_ab²) div (s_a·s_b) (squaring clears the
    * square root; cosine is non-negative here so the order is preserved).
    * The per-item form of [[marketBasket]]'s global rule list — "users
    * who bought X also bought" is THE production recommendation query.
    *
    * Scale: the pair frame is the same basket-bounded self-join; the
    * top-3 cut is a window PARTITIONED by item (per-item candidate fan
    * bounded by the item's co-purchase vocabulary, never the corpus).
    * Headroom: 10⁶·s_ab² < 2⁶³ holds to s_ab ≈ 3·10⁶ baskets per pair —
    * beyond that drop the 10⁶ scale to 10⁴.
    */
  /** The unsorted top-3 recommendation frame — shared by the public query
    * and the coverage/exposure audit (which re-aggregates immediately, so
    * the presentation sort would be a wasted exchange there).
    */
  private def rankedRecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val items = itemsOf(s, dir)
    val supp = items.groupBy($"p").agg(count(lit(1)).as("s"))
    val pairs = pairsOf(items)
    val sym = pairs.select($"pa".as("item"), $"pb".as("rec"), $"s_ab")
      .unionByName(pairs.select($"pb".as("item"), $"pa".as("rec"), $"s_ab"))
    sym
      .join(supp.select($"p".as("item"), $"s".as("s_i")), Seq("item"))
      .join(supp.select($"p".as("rec"), $"s".as("s_r")), Seq("rec"))
      .withColumn("cos2_ppm",
        expr("(1000000 * s_ab * s_ab) div (s_i * s_r)"))
      .withColumn("rn", row_number().over(Window.partitionBy($"item")
        .orderBy($"cos2_ppm".desc, $"s_ab".desc, $"rec")))
      .where($"rn" <= 3)
      .select($"item", $"rn", $"rec", $"s_ab", $"cos2_ppm")
  }

  def itemCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rankedRecs(s, dir).orderBy($"item", $"rn")
  }

  /** Aggregate DIVERSITY of the recommender (Adomavicius–Kwon 2012): what
    * a per-list quality metric cannot see — how much of the catalog the
    * top-3 lists collectively surface (coverage), and how concentrated
    * the exposure is across items (Gini over per-item recommendation
    * counts, zeros included — the popularity-bias number; G → 1 means a
    * few blockbusters absorb every slot, the failure mode item-item CF
    * is known for). One row: catalog size, distinct items recommended,
    * coverage ‰, exposure Gini ‰.
    *
    * Scale: the rec frame is the measured basket-bounded shape; exposure
    * is one keyed count; the Gini rides GlobalOrder's exact rank over
    * the CATALOG-sized frame (bounded by the part table, fixed while
    * orders multiply) with the overflow-safe two-step permille division
    * (the stat_gini idiom).
    */
  def recCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exposure = rankedRecs(s, dir).groupBy($"rec".as("item"))
      .agg(count(lit(1)).as("x"))
    val full = Tables.part(s, dir).select($"p_partkey".as("item"))
      .join(exposure, Seq("item"), "left")
      .select($"item", coalesce($"x", lit(0L)).as("x"))
    val (ranked, n) = graft.operators.GlobalOrder.rank(
      full, Seq(col("x"), col("item")), "i")
    ranked.agg(sum($"x").as("sx"), sum($"i" * $"x").as("six"),
        count(when($"x" > 0L, 1)).as("dis"))
      .select(lit(n).as("catalog_n"), $"dis".as("reco_distinct"),
        (($"dis" * 1000L) / n).cast("long").as("coverage_pm"),
        expr(s"""((2 * six - ${n + 1} * sx) div ($n * sx)) * 1000
                 + (((2 * six - ${n + 1} * sx) % ($n * sx)) * 1000)
                   div ($n * sx)""").as("exposure_gini_pm"))
  }

  val recCoverageSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |supp AS (SELECT p, count(*)::BIGINT AS s FROM items GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS s_ab
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (
      |  SELECT pa AS item, pb AS rec, s_ab FROM pairs
      |  UNION ALL
      |  SELECT pb, pa, s_ab FROM pairs),
      |scored AS (
      |  SELECT sym.item, sym.rec, sym.s_ab,
      |    (1000000 * sym.s_ab * sym.s_ab) // (si.s * sr.s) AS cos2_ppm
      |  FROM sym JOIN supp si ON sym.item = si.p
      |           JOIN supp sr ON sym.rec = sr.p),
      |recs AS (
      |  SELECT rec FROM (
      |    SELECT rec, row_number() OVER (PARTITION BY item
      |      ORDER BY cos2_ppm DESC, s_ab DESC, rec) AS rn
      |    FROM scored) t
      |  WHERE rn <= 3),
      |expo AS (SELECT rec AS item, count(*)::BIGINT AS x FROM recs
      |         GROUP BY 1),
      |fullc AS (
      |  SELECT p.p_partkey AS item, coalesce(e.x, 0)::BIGINT AS x
      |  FROM part p LEFT JOIN expo e ON p.p_partkey = e.item),
      |rk AS (SELECT item, x,
      |         row_number() OVER (ORDER BY x, item)::BIGINT AS i
      |       FROM fullc),
      |g AS (
      |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |    sum(i * x)::BIGINT AS six,
      |    count(*) FILTER (x > 0)::BIGINT AS dis
      |  FROM rk)
      |SELECT n AS catalog_n, dis AS reco_distinct,
      |  (dis * 1000 // n)::BIGINT AS coverage_pm,
      |  ((2 * six - (n + 1) * sx) // (n * sx) * 1000
      |    + ((2 * six - (n + 1) * sx) % (n * sx)) * 1000 // (n * sx))
      |    ::BIGINT AS exposure_gini_pm
      |FROM g""".stripMargin

  val itemCosineSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |supp AS (SELECT p, count(*)::BIGINT AS s FROM items GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS s_ab
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (
      |  SELECT pa AS item, pb AS rec, s_ab FROM pairs
      |  UNION ALL
      |  SELECT pb, pa, s_ab FROM pairs),
      |scored AS (
      |  SELECT item, rec, s_ab,
      |    ((1000000 * s_ab * s_ab) // (si.s * sr.s))::BIGINT AS cos2_ppm
      |  FROM sym
      |  JOIN supp si ON item = si.p
      |  JOIN supp sr ON rec = sr.p),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY item
      |    ORDER BY cos2_ppm DESC, s_ab DESC, rec) AS rn
      |  FROM scored)
      |SELECT item, rn::BIGINT AS rn, rec, s_ab, cos2_ppm
      |FROM ranked WHERE rn <= 3 ORDER BY item, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_market_basket" -> marketBasket _,
    "rec_item_cosine" -> itemCosine _,
    "rec_coverage" -> recCoverage _)

  val oracles: Map[String, String] = Map(
    "rec_market_basket" -> marketBasketSql,
    "rec_item_cosine" -> itemCosineSql,
    "rec_coverage" -> recCoverageSql)
}
