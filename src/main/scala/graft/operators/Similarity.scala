package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps
import graft.sources.Tables
import graft.Pin.PinOps

/** Similarity search over the `embeddings` table (builder prompt: ANN as a
  * first-class pipeline operator; SURVEY.md §7.2 M5).
  *
  * Vectors are quantized to fixed-point integers (`floor(x * 10000)`) before
  * any arithmetic: dot products and squared norms are then EXACT int64 in
  * both Spark and DuckDB, so cosine scores are bit-identical doubles (same
  * ints → same IEEE sqrt/division) and rankings can never diverge across
  * engines. Quantization error at 1e-4 is far below any semantic threshold.
  *
  * Scale design:
  *  - brute-force top-k: the query set is broadcast (it's small by
  *    definition); the 100 TB side streams through one narrow stage — no
  *    shuffle at all until the per-query top-k (TakeOrdered over k×parts).
  *  - LSH buckets: 8 deterministic random hyperplanes → 256 buckets; the
  *    candidate join is per-bucket, which is the standard sub-linear ANN
  *    path (probe only matching buckets instead of all pairs).
  */
object Similarity {

  /** Quantized vector: array<long> of floor(x*10000). */
  private def qvec(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000d).cast("long"))

  /** Codegen'd integer kernels ([[graft.functions.ArrayOps]]) — the
    * zip_with/aggregate equivalents are HigherOrderFunctions (one lambda
    * eval per element per row, no whole-stage codegen), which dominated the
    * bench at millions of pairs × 64 dims.
    */
  private def dot(a: Column, b: Column): Column = ArrayOps.longDot(a, b)

  private def norm2(a: Column): Column = ArrayOps.longNorm2(a)

  private val qvecCte =
    """WITH qv AS (
      |  SELECT vec_id,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |nrm AS (
      |  SELECT vec_id, sum(e * e)::BIGINT AS n2
      |  FROM (SELECT vec_id, unnest(q) AS e FROM qv) GROUP BY vec_id)
      |""".stripMargin

  /** Brute-force cosine top-5 per query vector (query set = vec_id < 10).
    * The exact baseline every ANN variant is judged against.
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 5)
      .select($"qid", $"vec_id", $"cos", $"rn")
      .orderBy($"qid", $"rn")
  }

  val cosineTopKSql: String = qvecCte +
    """, dots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT qid, d.vec_id,
      |    round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |  FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |              JOIN nrm ne ON d.vec_id = ne.vec_id)
      |SELECT qid, vec_id, cos, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, vec_id) AS rn FROM scored) t
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** Hard-negative mining for contrastive training: per query vector, the
    * top-3 highest-cosine candidates whose LABEL DIFFERS from the query's —
    * the "close but wrong" examples a contrastive/metric-learning recipe
    * pairs against its positives (and the retrieval-eval frame for "which
    * wrong class is nearest"). Same exact fixed-point arithmetic as
    * [[cosineTopK]]; the label-mismatch predicate rides inside the
    * broadcast join, so wrong-label filtering costs nothing extra.
    *
    * Scale: identical shape to the brute-force top-k baseline — queries
    * broadcast, corpus streamed once, per-query top-3 over the bounded
    * window. With an index, the same mining runs over [[ivfTopK]]'s
    * candidates instead; this is the exact contract it must match.
    */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"label".as("qlabel"),
        $"q".as("qq"), $"n2".as("qn2"))
    emb.crossJoin(broadcast(queries))
      .filter($"label" =!= $"qlabel")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"label".cast("long").as("neg_label"),
        $"cos", $"rn")
      .orderBy($"qid", $"rn")
  }

  val hardNegativesSql: String =
    """WITH qv AS (
      |  SELECT vec_id, label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |nrm AS (
      |  SELECT vec_id, sum(e * e)::BIGINT AS n2
      |  FROM (SELECT vec_id, unnest(q) AS e FROM qv) GROUP BY vec_id),
      |dots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, label, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.label <> q.label) z
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT qid, d.vec_id,
      |    round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |  FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |              JOIN nrm ne ON d.vec_id = ne.vec_id)
      |SELECT t.qid, t.vec_id, qv.label::BIGINT AS neg_label, t.cos, t.rn
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, vec_id) AS rn FROM scored) t
      |JOIN qv ON t.vec_id = qv.vec_id
      |WHERE t.rn <= 3 ORDER BY t.qid, t.rn""".stripMargin

  /** Near-duplicate pairs: all pairs with cosine ≥ 0.45 (calibrated to this
    * corpus's max pairwise cosine of 0.51), computed EXACTLY.
    *
    * Shape: a B×B grid-blocked self-equi-join (the Okcan–Riedewald
    * theta-join): each side is replicated B ways on a block coordinate and
    * the pair (x, y) meets in exactly one (g(x), g(y)) cell, so the Θ(n²)
    * compares hash-partition evenly across the cluster — no
    * BroadcastNestedLoopJoin, nothing broadcast that grows with the data.
    * Exact all-pairs at this radius is inherently quadratic in compares
    * (LSH gating was measured on this corpus: 8-hyperplane buckets recall
    * 1/14 of the true pairs at sf0.01 — sketch bits don't separate at
    * cos ≈ 0.45, so candidate gating would change the answer); the
    * sub-quadratic alternative when approximate recall is acceptable is
    * [[lshTopK]]/[[ivfTopK]].
    */
  /** Grid-join core over quantized rows (vec_id, q, n2) — package-visible
    * so the spec can feed synthetic vectors and compare against a naive
    * all-pairs reference.
    */
  private[operators] def nearDupPairsOf(emb: DataFrame, threshold: Double,
      blocks: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val blockIds = array((0 until blocks).map(lit): _*)
    val l = emb
      .select($"vec_id".as("a"), $"q".as("qa"), $"n2".as("na"),
        ($"vec_id" % blocks).as("gl"))
      .withColumn("gr", explode(blockIds))
    val r = emb
      .select($"vec_id".as("b"), $"q".as("qb"), $"n2".as("nb"),
        ($"vec_id" % blocks).as("gr"))
      .withColumn("gl", explode(blockIds))
      // With only B² distinct cell keys and every key heavily duplicated,
      // sort-merge buffers+rescans the matched group per stream row; a
      // shuffled hash join builds each cell's table once and streams the
      // probe side through codegen (measured 4× faster at sf0.1).
      .hint("shuffle_hash")
    l.join(r, Seq("gl", "gr")).filter($"a" < $"b")
      .withColumn("cos",
        round(dot($"qa", $"qb").cast("double")
          / (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))), 4))
      .filter($"cos" >= threshold)
      .select($"a", $"b", $"cos")
  }

  /** Quantized embeddings frame shared by the pair queries: (vec_id, q, n2). */
  private[operators] def qEmb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
  }

  def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 32 blocks → 1024 cells: finer cells cost more replication (each row
    // is shipped to B cells) but keep every task small and even; measured
    // best at local[32] and the right order for a 1000-executor cluster,
    // where B should track the executor count.
    nearDupPairsOf(qEmb(s, dir), 0.45, 32).orderBy($"a", $"b")
  }

  val nearDupPairsSql: String = qvecCte +
    """, dots AS (
      |  SELECT a, b, sum(x * y) AS d FROM (
      |    SELECT a.vec_id AS a, b.vec_id AS b,
      |           unnest(a.q) AS x, unnest(b.q) AS y
      |    FROM qv a JOIN qv b ON a.vec_id < b.vec_id) z
      |  GROUP BY 1, 2)
      |SELECT a, b, round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cos
      |FROM dots JOIN nrm na ON a = na.vec_id JOIN nrm nb ON b = nb.vec_id
      |WHERE round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.45
      |ORDER BY a, b""".stripMargin

  /** SEMANTIC dedup clusters: connected components over the exact
    * cosine ≥ 0.45 pair graph — the embedding-space analogue of
    * [[graft.operators.TextOps.dedupClusters]] (which clusters over
    * shingle-LSH pairs). A training-data pipeline runs this after
    * near-dup pair generation to keep one canonical document per
    * semantic-duplicate group. Components via the same large-star /
    * small-star contraction (O(log n) rounds, diameter-independent);
    * the pair input is the grid-blocked exact join UNSORTED (the
    * contraction re-shuffles immediately, so a presentation sort here
    * would be a wasted global exchange at 100 TB). Oracle: reachability
    * replayed as a DuckDB recursive CTE over the same pair predicate.
    */
  def semanticClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.embeddings(s, dir).select($"vec_id")
    val (labels, _) = TextOps.starContraction(nodes,
      nearDupPairsOf(qEmb(s, dir), 0.45, 32).select($"a", $"b"))
    labels.select($"vec_id", $"label".as("cluster"),
        ($"vec_id" === $"label").cast("int").as("is_canonical"))
      .orderBy($"vec_id")
  }

  val semanticClustersSql: String =
    qvecCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, dots AS (
        |  SELECT a, b, sum(x * y) AS d FROM (
        |    SELECT a.vec_id AS a, b.vec_id AS b,
        |           unnest(a.q) AS x, unnest(b.q) AS y
        |    FROM qv a JOIN qv b ON a.vec_id < b.vec_id) z
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a, b FROM dots
        |  JOIN nrm na ON a = na.vec_id JOIN nrm nb ON b = nb.vec_id
        |  WHERE round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.45),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach(node, m) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node)
        |SELECT node AS vec_id, min(m)::BIGINT AS cluster,
        |  CASE WHEN node = min(m) THEN 1 ELSE 0 END AS is_canonical
        |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin

  /** DBSCAN over the embedding space (Ester et al., KDD'96), ε-neighbor
    * predicate = exact cosine ≥ 0.30, minPts = 4: CORE points are those
    * with ≥ 3 ε-neighbors (≥ minPts counting self), clusters are the
    * connected components of the core–core ε-graph, BORDER points are
    * non-core nodes within ε of some core (assigned the min core-neighbor
    * cluster — deterministic, where the textbook's "first discoverer"
    * is scan-order-dependent), everything else is NOISE. The density
    * clustering complement of [[semanticClusters]] (plain CC): a single
    * stray ε-pair no longer glues two dense clusters together unless
    * both endpoints are core — the chaining failure plain CC has on
    * bridge points, which is the reason DBSCAN exists.
    *
    * Shape: the ε-graph is the grid-blocked exact pair join
    * ([[nearDupPairsOf]] — Θ(n²) compares hash-partitioned evenly, no
    * broadcast that grows with the data); degrees and the border
    * assignment are keyed aggregations over it; components via
    * large/small-star contraction (O(log n) rounds). At 100 TB the
    * ε-graph build is the quadratic term and swaps to the IVF-bucketed
    * form — [[dbscanIvfClusters]], shipped, same cluster step via the
    * shared [[dbscanTail]].
    *
    * Output: (vec_id, role 2=core/1=border/0=noise, cluster; −1 for
    * noise). Oracle: same graph in SQL, components replayed as a
    * recursive CTE over the core–core edges.
    */
  def dbscanClusters(s: SparkSession, dir: String): DataFrame =
    dbscanTail(s, dir,
      nearDupPairsOf(qEmb(s, dir), 0.30, 32).select("a", "b"))

  /** The DBSCAN core/border/noise fold shared by the exact ([[
    * dbscanClusters]]) and IVF-bucketed ([[dbscanIvfClusters]]) forms:
    * from an ε-pair frame (a < b) to (vec_id, role, cluster). One
    * maintained copy so the production swap can never drift from the
    * exact semantics it approximates.
    */
  private def dbscanTail(s: SparkSession, dir: String,
      edges0: DataFrame): DataFrame = {
    import s.implicits._
    // the ε-pair frame feeds degrees, core edges, and border assignment
    val edges = edges0.pin(true)
    val sym = edges.unionByName(edges.select($"b".as("a"), $"a".as("b")))
    val core = sym.groupBy($"a").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= 3L).select($"a".as("vec_id"))
    val coreEdges = edges
      .join(core.select($"vec_id".as("a")), Seq("a"))
      .join(core.select($"vec_id".as("b")), Seq("b"))
      .select($"a", $"b")
    val (labels, _) = TextOps.starContraction(core, coreEdges)
    // labels cover exactly the core set, so joining sym against them both
    // restricts to core neighbors and fetches their cluster in one go
    val nearCore = sym
      .join(labels.select($"vec_id".as("b"), $"label".as("bcl")), Seq("b"))
      .groupBy($"a".as("vec_id")).agg(min($"bcl").as("bcl"))
    Tables.embeddings(s, dir).select($"vec_id")
      .join(labels.withColumnRenamed("label", "ccl"), Seq("vec_id"), "left")
      .join(nearCore, Seq("vec_id"), "left")
      .select($"vec_id",
        when($"ccl".isNotNull, 2L).when($"bcl".isNotNull, 1L)
          .otherwise(0L).as("role"),
        coalesce($"ccl", $"bcl", lit(-1L)).as("cluster"))
      .orderBy($"vec_id")
  }

  val dbscanClustersSql: String =
    """WITH RECURSIVE qv AS MATERIALIZED (
      |  SELECT vec_id,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |nrm AS MATERIALIZED (
      |  SELECT vec_id, sum(e * e)::BIGINT AS n2
      |  FROM (SELECT vec_id, unnest(q) AS e FROM qv) GROUP BY vec_id),
      |dots AS MATERIALIZED (
      |  SELECT a, b, sum(x * y) AS d FROM (
      |    SELECT a.vec_id AS a, b.vec_id AS b,
      |           unnest(a.q) AS x, unnest(b.q) AS y
      |    FROM qv a JOIN qv b ON a.vec_id < b.vec_id) z
      |  GROUP BY 1, 2),
      |eps AS MATERIALIZED (
      |  SELECT a, b FROM dots
      |  JOIN nrm na ON a = na.vec_id JOIN nrm nb ON b = nb.vec_id
      |  WHERE round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.30),
      |sym AS MATERIALIZED (
      |  SELECT a, b FROM eps UNION ALL SELECT b, a FROM eps),
      |core AS MATERIALIZED (
      |  SELECT a AS v FROM sym GROUP BY a HAVING count(*) >= 3),
      |ce AS MATERIALIZED (
      |  SELECT e.a, e.b FROM eps e
      |  JOIN core ca ON e.a = ca.v JOIN core cb ON e.b = cb.v),
      |cedges AS (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce),
      |reach(node, m) AS (
      |  SELECT v, v FROM core
      |  UNION
      |  SELECT e.a, r.m FROM cedges e JOIN reach r ON e.b = r.node),
      |cl AS MATERIALIZED (
      |  SELECT node, min(m)::BIGINT AS cluster FROM reach GROUP BY node),
      |nearcore AS (
      |  SELECT s.a AS v, min(c.cluster) AS bcl
      |  FROM sym s JOIN cl c ON c.node = s.b GROUP BY s.a)
      |SELECT e.vec_id,
      |  (CASE WHEN c.cluster IS NOT NULL THEN 2
      |        WHEN n.bcl IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS role,
      |  coalesce(c.cluster, n.bcl, -1)::BIGINT AS cluster
      |FROM embeddings e
      |LEFT JOIN cl c ON c.node = e.vec_id
      |LEFT JOIN nearcore n ON n.v = e.vec_id
      |ORDER BY vec_id""".stripMargin

  /** IVF-BUCKETED DBSCAN — the 100 TB form of [[dbscanClusters]] (VERDICT
    * r13 missing #3): ε-graph CANDIDATES come from IVF cell co-membership
    * instead of the Θ(n²) grid join. Each vector is assigned to its TWO
    * nearest k-means cells (nprobe = 2 — the adjacent-cell probe that
    * recovers most boundary pairs a single-cell bucketing drops), candidate
    * pairs are vectors sharing any probed cell, and candidates are verified
    * with the same exact integer cosine ≥ 0.30 predicate, INLINE in the
    * co-membership join (no candidate materialization — see ivfEpsEdges).
    * Compare volume is Σ over cells of (probed population)² ≈ 4n²/nCells —
    * sub-quadratic only when nCells SCALES: nCells ≈ √n balances the n·k
    * assignment term against the n²/k compare term at n^1.5 total (the
    * Faiss-style sizing; the gate pins nCells = 8 for the 500-vector
    * corpus and the ScalingBench probe passes 8·√mult). The core/border/noise
    * fold is the SHARED [[dbscanTail]], so the approximation lives entirely
    * in candidate generation: a true ε-pair in no common probed cell is
    * invisible, which can demote a boundary core point — the standard
    * IVF-DBSCAN trade, and DbscanIvfSpec measures the realized pair recall
    * vs the exact ε-graph at gate scale. Both engines replay the identical
    * deterministic fit + probe, so the oracle is an exact hash gate on the
    * SAME approximate answer.
    */
  def dbscanIvfClusters(s: SparkSession, dir: String,
      nCells: Int = 8): DataFrame =
    dbscanTail(s, dir, ivfEpsEdges(s, dir, nCells))

  /** The IVF-bucketed ε-graph of [[dbscanIvfClusters]] (candidates from
    * nprobe=2 cell co-membership, verified exactly) — package-visible so
    * DbscanIvfSpec can measure its realized pair recall against the exact
    * grid-join ε-graph.
    */
  private[operators] def ivfEpsEdges(s: SparkSession, dir: String,
      nCells: Int = 8): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir).pin(true) // fit + membership scoring
    val n = lit(nCells.toLong)
    val cents = broadcast(ivfCentroids(s, emb, nCells)
      .withColumn("cn2", norm2($"cq")))
    // nprobe=2 membership: the (d2, cid) pack makes the per-vector top-2
    // deterministic; the window is nCells rows per vector, never
    // corpus-wide. memb CARRIES (q, n2) so the verify runs INLINE in the
    // co-membership join — the first cut materialized a distinct over the
    // raw candidate set and measured 241 s at the ×10 probe (the
    // candidate shuffle, not the compares, was the wall); this shape
    // verifies in the join like the grid join and distincts only the
    // surviving ε-pairs (a pair can co-occur in both probed cells).
    val memb = emb.crossJoin(cents)
      .withColumn("key",
        ($"n2" - lit(2L) * dot($"q", $"cq") + $"cn2") * n + $"cid")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"key")))
      .filter($"rn" <= 2)
      .select($"vec_id", ($"key" % n).as("cell"), $"q", $"n2")
      .pin(true) // both sides of the co-membership join; 2 rows/vec
    val l = memb.select($"cell", $"vec_id".as("a"), $"q".as("qa"),
      $"n2".as("na"))
    val r = memb.select($"cell", $"vec_id".as("b"), $"q".as("qb"),
      $"n2".as("nb"))
      // same rationale as the grid join: few heavily-duplicated cell keys
      // favor a shuffled hash join over sort-merge's group rescans
      .hint("shuffle_hash")
    l.join(r, Seq("cell"))
      .filter($"a" < $"b")
      .filter(round(dot($"qa", $"qb").cast("double")
        / (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))), 4)
        >= 0.30)
      .select($"a", $"b").distinct()
  }

  // lazy: kmeansIters/kmeansCtes are declared further down the object and
  // plain-val initialization order would read kmeansIters as 0 here (the
  // pprRankGroupsSql precedent)
  lazy val dbscanIvfClustersSql: String = {
    val t = kmeansIters
    qvecCte.replaceFirst("WITH ", "WITH RECURSIVE ") + kmeansCtes +
      s""",
         |keys AS (
         |  SELECT cd.vec_id,
         |    ((ne.n2 - 2 * cd.d + cn.cn2) * 8 + cd.cid) AS key
         |  FROM cd$t cd JOIN nrm ne ON cd.vec_id = ne.vec_id
         |               JOIN cn$t cn ON cd.cid = cn.cid),
         |memb AS MATERIALIZED (
         |  SELECT vec_id, (key % 8)::BIGINT AS cell FROM (
         |    SELECT vec_id, key,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY key) AS rn
         |    FROM keys) z
         |  WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM memb l JOIN memb r ON l.cell = r.cell
         |    AND l.vec_id < r.vec_id),
         |dots AS MATERIALIZED (
         |  SELECT a, b, sum(x * y) AS d FROM (
         |    SELECT c.a, c.b, unnest(qa.q) AS x, unnest(qb.q) AS y
         |    FROM cand c JOIN qv qa ON c.a = qa.vec_id
         |                JOIN qv qb ON c.b = qb.vec_id) z
         |  GROUP BY 1, 2),
         |eps AS MATERIALIZED (
         |  SELECT a, b FROM dots
         |  JOIN nrm na ON a = na.vec_id JOIN nrm nb ON b = nb.vec_id
         |  WHERE round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.30),
         |sym AS MATERIALIZED (
         |  SELECT a, b FROM eps UNION ALL SELECT b, a FROM eps),
         |core AS MATERIALIZED (
         |  SELECT a AS v FROM sym GROUP BY a HAVING count(*) >= 3),
         |ce AS MATERIALIZED (
         |  SELECT e.a, e.b FROM eps e
         |  JOIN core ca ON e.a = ca.v JOIN core cb ON e.b = cb.v),
         |cedges AS (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce),
         |reach(node, m) AS (
         |  SELECT v, v FROM core
         |  UNION
         |  SELECT e.a, r.m FROM cedges e JOIN reach r ON e.b = r.node),
         |cl AS MATERIALIZED (
         |  SELECT node, min(m)::BIGINT AS cluster FROM reach GROUP BY node),
         |nearcore AS (
         |  SELECT s.a AS v, min(c.cluster) AS bcl
         |  FROM sym s JOIN cl c ON c.node = s.b GROUP BY s.a)
         |SELECT e.vec_id,
         |  (CASE WHEN c.cluster IS NOT NULL THEN 2
         |        WHEN n.bcl IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS role,
         |  coalesce(c.cluster, n.bcl, -1)::BIGINT AS cluster
         |FROM embeddings e
         |LEFT JOIN cl c ON c.node = e.vec_id
         |LEFT JOIN nearcore n ON n.v = e.vec_id
         |ORDER BY vec_id""".stripMargin
  }

  /** Random-hyperplane LSH bucketing: 8 deterministic integer hyperplanes
    * (h[j][i] = ((1 + (j*64+i)*2654435761) mod 1999) − 999), sign of each
    * integer dot product is one bucket bit. Exact int arithmetic → exact
    * cross-engine parity. At scale, ANN probes only the query's bucket.
    */
  private def hyperplane(j: Int): Seq[Long] =
    (0 until 64).map(i => ((1L + (j * 64L + i) * 2654435761L) % 1999L) - 999L)

  /** Unsorted bucket assignment (the reusable building block — the
    * presentation orderBy lives only in the oracle query, so joins against
    * this never drag a wasted range-exchange + sort into their plans).
    */
  private def lshBucketsRaw(s: SparkSession, dir: String,
      nPlanes: Int = 8): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
    val bucket = (0 until nPlanes).map { j =>
      val h = array(hyperplane(j).map(lit): _*)
      when(dot($"q", h) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    emb.select($"vec_id", bucket.as("bucket"))
  }

  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lshBucketsRaw(s, dir).orderBy($"vec_id")
  }

  val lshBucketsSql: String =
    """WITH qv AS (
      |  SELECT vec_id,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |comp AS (
      |  SELECT vec_id, unnest(q) AS e, generate_subscripts(q, 1) - 1 AS i
      |  FROM qv),
      |hp AS (
      |  SELECT j, i, ((1 + (j * 64 + i) * 2654435761) % 1999) - 999 AS h
      |  FROM range(8) t(j), range(64) s(i)),
      |dots AS (
      |  SELECT vec_id, j, sum(e * h) AS d
      |  FROM comp JOIN hp USING (i) GROUP BY 1, 2)
      |SELECT vec_id,
      |  sum(CASE WHEN d >= 0 THEN (2^j)::BIGINT ELSE 0 END)::BIGINT AS bucket
      |FROM dots GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Bucketed ANN top-3: brute-force cosine, but only within the query's
    * LSH bucket — the sub-linear scale path (candidates ∝ bucket size).
    */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val buckets = lshBucketsRaw(s, dir)
    val withB = emb.join(buckets, Seq("vec_id"))
    val queries = withB.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"),
        $"bucket".as("qbucket"))
    withB.join(broadcast(queries),
        $"bucket" === $"qbucket" && $"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"cos", $"rn")
      .orderBy($"qid", $"rn")
  }

  val lshTopKSql: String = qvecCte +
    """, comp AS (
      |  SELECT vec_id, unnest(q) AS e, generate_subscripts(q, 1) - 1 AS i
      |  FROM qv),
      |hp AS (
      |  SELECT j, i, ((1 + (j * 64 + i) * 2654435761) % 1999) - 999 AS h
      |  FROM range(8) t(j), range(64) s(i)),
      |hdots AS (
      |  SELECT vec_id, j, sum(e * h) AS d
      |  FROM comp JOIN hp USING (i) GROUP BY 1, 2),
      |buckets AS (
      |  SELECT vec_id, sum(CASE WHEN d >= 0 THEN (2^j)::BIGINT ELSE 0 END) AS bucket
      |  FROM hdots GROUP BY vec_id),
      |dots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT qv.vec_id, qv.q, b.bucket FROM qv
      |          JOIN buckets b ON qv.vec_id = b.vec_id WHERE qv.vec_id < 10) q
      |    JOIN (SELECT qv.vec_id, qv.q, b.bucket FROM qv
      |          JOIN buckets b ON qv.vec_id = b.vec_id) e
      |      ON q.bucket = e.bucket AND e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT qid, d.vec_id,
      |    round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |  FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |              JOIN nrm ne ON d.vec_id = ne.vec_id)
      |SELECT qid, vec_id, cos, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, vec_id) AS rn FROM scored) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** IVF coarse quantizer: seeded k-means in pure DataFrame ops. Init
    * centroids are the vectors with vec_id 0..nCells-1 (deterministic
    * seed), then `iters` Lloyd iterations refine them. Centroids stay
    * INTEGER vectors — each iteration re-quantizes the cluster mean per
    * component as floor(sum/m) (sum, m exact int64, the division exact in
    * doubles since |sum/m − k| is either 0 or ≥ 1/m ≫ ulp) — so every
    * distance is exact int64 and the SQL oracle reproduces assignment
    * bit-for-bit. Empty clusters keep their previous centroid. No driver
    * collect: the whole fit is one DAG over nCells×64 centroid cells.
    *
    * The gate queries pin (nCells=8, iters=2) — right for the 500-vector
    * gate corpus, and the oracle SQL mirrors exactly those values. A real
    * deployment sizes nCells ≈ √N (the standard IVF heuristic: balances
    * cells-scanned-per-probe against vectors-per-cell), which is why both
    * knobs are arguments: [[saveIvfIndex]] passes them through so a
    * 100 TB index build is a parameter choice, not a code change.
    */
  private val kmeansIters = 2

  private[operators] def ivfCentroids(s: SparkSession, emb: DataFrame,
      nCells: Int = 8, iters: Int = kmeansIters): DataFrame = {
    import s.implicits._
    require(nCells > 0, s"nCells must be positive, got $nCells")
    // the min(d2*n + cid) % n tie-break packs (distance, id) into one
    // int64: d2 ≤ ~4·(2e4)²·64 ≈ 1e11 for quantized embeddings, so the
    // product stays far from overflow for any plausible cell count
    val n = lit(nCells.toLong)
    var cents = emb.filter($"vec_id" < nCells)
      .select($"vec_id".as("cid"), $"q".as("cq"))
    for (_ <- 1 to iters) {
      val withN = broadcast(cents.withColumn("cn2", norm2($"cq")))
      // carry q THROUGH the assignment aggregate (first() over a group
      // whose q values are all copies of the same row — deterministic by
      // construction) instead of re-joining emb on vec_id afterwards: the
      // r16 shape paid a second corpus scan plus a corpus-sized
      // sort-merge join per iteration just to reattach the vector the
      // aggregate already had (guide §2.3: shuffle the payload once).
      val assigned = emb.crossJoin(withN)
        .withColumn("d2", $"n2" - lit(2L) * dot($"q", $"cq") + $"cn2")
        .groupBy($"vec_id")
        .agg((min($"d2" * n + $"cid") % n).as("cid"), first($"q").as("q"))
      val sums = assigned
        .select($"cid", posexplode($"q"))
        .groupBy($"cid", $"pos")
        .agg(sum($"col").as("sv"), count(lit(1)).as("m"))
        .withColumn("c", floor($"sv".cast("double") / $"m").cast("long"))
      val next = sums.groupBy($"cid")
        .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
          x => x.getField("c")).as("cq2"))
      // pin the nCells-row centroid table EVERY iteration (bounded at any
      // corpus size), not only after the loop: unpinned, iteration t's
      // frame references iteration t-1's twice (broadcast side + carry
      // join), so the final single DAG re-scanned the corpus ~2^iters
      // times (the r16 plan embedded ~10 emb scans for iters=2). Each
      // iteration now scans the corpus exactly once.
      cents = cents.join(next, Seq("cid"), "left")
        .select($"cid", coalesce($"cq2", $"cq").as("cq"))
        .pin(true)
    }
    // the loop's last pin IS the materialized table downstream queries
    // probe from several plan branches (guarded for a zero-iteration fit)
    if (iters <= 0) cents.pin(true) else cents
  }

  /** Cell assignment against the fitted centroids: smallest exact integer
    * squared-L2 distance (‖a−c‖² = ‖a‖² − 2a·c + ‖c‖², all int64),
    * tie-break smallest id — d2 ≥ 0 and cid < 8, so min(d2*8 + cid) % 8 is
    * the tie-broken nearest centroid. At scale, ANN probes only the query's
    * cell (nprobe=1 here).
    */
  private def ivfAssignRaw(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir)
    ivfAssignOf(emb, ivfCentroids(s, emb))
  }

  /** Assignment of an already-quantized frame against already-fitted
    * centroids — callers that persist the index ([[saveIvfIndex]]) fit
    * once and pass the result here instead of refitting. `nCells` must
    * cover every cid in `centroids` (the tie-break packs cid into the
    * low digits mod nCells).
    */
  private[operators] def ivfAssignOf(emb: DataFrame, centroids: DataFrame,
      nCells: Int = 8): DataFrame = {
    import emb.sparkSession.implicits._
    val n = lit(nCells.toLong)
    val cents = broadcast(centroids.withColumn("cn2", norm2($"cq")))
    emb.crossJoin(cents)
      .withColumn("d2", $"n2" - lit(2L) * dot($"q", $"cq") + $"cn2")
      .groupBy($"vec_id")
      .agg((min($"d2" * n + $"cid") % n).as("centroid"))
  }

  /** SQL mirror of the k-means fit: one (cn, cd, a) assignment block per
    * iteration plus (s, k, cent) mean-requantization blocks; the final
    * a`kmeansIters` is the assignment. Shared by both IVF oracles.
    */
  private def kmeansCtes: String = kmeansCtesOver("qv")

  /** [[kmeansCtes]] with the fit corpus parameterized (`src` must be a
    * CTE with the qv shape) — the refresh oracle fits on the BASE subset
    * only. `nrm` stays corpus-wide (it is keyed by vec_id, so base rows
    * join their own norms).
    */
  private def kmeansCtesOver(src: String): String = {
    val sb = new StringBuilder
    sb ++= s", cent0 AS (SELECT vec_id AS cid, q AS cq FROM $src WHERE vec_id < 8)"
    for (t <- 0 to kmeansIters) {
      sb ++=
        s""",
           |cn$t AS (
           |  SELECT cid, sum(y * y)::BIGINT AS cn2
           |  FROM (SELECT cid, unnest(cq) AS y FROM cent$t) GROUP BY cid),
           |cd$t AS (
           |  SELECT vec_id, cid, sum(x * y)::BIGINT AS d FROM (
           |    SELECT e.vec_id, c.cid, unnest(e.q) AS x, unnest(c.cq) AS y
           |    FROM $src e CROSS JOIN cent$t c) z
           |  GROUP BY 1, 2),
           |a$t AS (
           |  SELECT cd.vec_id,
           |    (min((ne.n2 - 2 * cd.d + cn.cn2) * 8 + cd.cid) % 8)::BIGINT AS cid
           |  FROM cd$t cd JOIN nrm ne ON cd.vec_id = ne.vec_id
           |               JOIN cn$t cn ON cd.cid = cn.cid
           |  GROUP BY cd.vec_id)""".stripMargin
      if (t < kmeansIters) {
        sb ++=
          s""",
             |s${t + 1} AS (
             |  SELECT a.cid, u.i, sum(u.e)::BIGINT AS s, count(*)::BIGINT AS m
             |  FROM a$t a JOIN (
             |    SELECT vec_id, unnest(q) AS e,
             |           generate_subscripts(q, 1) - 1 AS i FROM $src) u
             |    ON a.vec_id = u.vec_id
             |  GROUP BY 1, 2),
             |k${t + 1} AS (
             |  SELECT cid, list(floor(s::DOUBLE / m)::BIGINT ORDER BY i) AS cq
             |  FROM s${t + 1} GROUP BY cid),
             |cent${t + 1} AS (
             |  SELECT p.cid, coalesce(c.cq, p.cq) AS cq
             |  FROM cent$t p LEFT JOIN k${t + 1} c USING (cid))""".stripMargin
      }
    }
    sb.toString
  }

  def ivfAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ivfAssignRaw(s, dir).orderBy($"vec_id")
  }

  /** Simplified silhouette (Hruschka et al. 2004 — the centroid form of
    * Rousseeuw's 1987 silhouette) of the IVF k-means cells: per vector,
    * a = distance to its OWN centroid, b = distance to the nearest OTHER
    * centroid, s = (b − a)/max(a, b) in permille, averaged per cell —
    * the "is this clustering any good / is k right" readout the IVF
    * battery was missing (ivf_balance certifies cell SIZES; this
    * certifies cell SEPARATION — a balanced index whose silhouettes sit
    * near 0 still co-locates unrelated vectors and its probes pay
    * recall for it). The full silhouette's mean pairwise distances are
    * Θ(n²); the centroid form is THE deployment variant (O(n·k), one
    * broadcast), and with nearest-centroid assignment s ≥ 0 by
    * construction — low cells, not negative ones, are the alarm.
    * Distances: exact int64 squared-L2 via the (d2·k + cid) pack (a² =
    * pack div k), one IEEE sqrt/division per vector at the end — the
    * same determinism contract as the cosine rounds.
    *
    * Scale: one broadcast crossJoin (n·k rows, k = 8 cells) + two keyed
    * aggs; rides the same fitted centroids as every IVF query.
    */
  def simSilhouette(s: SparkSession, dir: String,
      nCells: Int = 8): DataFrame = {
    import s.implicits._
    val emb = qEmb(s, dir).pin(true) // fit + the distance fan
    val n = lit(nCells.toLong)
    val cents = broadcast(ivfCentroids(s, emb, nCells)
      .withColumn("cn2", norm2($"cq")))
    val dall = emb.crossJoin(cents)
      .select($"vec_id", $"cid",
        ($"n2" - lit(2L) * dot($"q", $"cq") + $"cn2").as("d2"))
      .pin(true) // own-argmin agg + the other-cell min
    val own = dall.groupBy($"vec_id")
      .agg(min($"d2" * n + $"cid").as("pack"))
      .select($"vec_id", ($"pack" % n).as("cid"),
        expr(s"pack div $nCells").as("a2"))
      .pin(true) // the alt join + the final readout
    val alt = dall.join(own.select($"vec_id", $"cid".as("own")), "vec_id")
      .filter($"cid" =!= $"own")
      .groupBy($"vec_id").agg(min($"d2").as("b2"))
    own.join(alt, Seq("vec_id"))
      .select($"cid",
        floor(lit(1000d)
          * (sqrt($"b2".cast("double")) - sqrt($"a2".cast("double")))
          / sqrt(greatest($"a2", $"b2", lit(1L)).cast("double")))
          .cast("long").as("spm"))
      .groupBy($"cid".as("cell"))
      .agg(count(lit(1)).as("n"),
        expr("sum(spm) div count(1)").cast("long").as("mean_sil_pm"))
      .orderBy($"cell")
  }

  lazy val simSilhouetteSql: String = {
    val t = kmeansIters
    qvecCte + kmeansCtes +
      s""",
         |dall AS (
         |  SELECT cd.vec_id, cd.cid, (ne.n2 - 2 * cd.d + cn.cn2) AS d2
         |  FROM cd$t cd JOIN nrm ne ON cd.vec_id = ne.vec_id
         |               JOIN cn$t cn ON cd.cid = cn.cid),
         |own AS (
         |  SELECT vec_id, (min(d2 * 8 + cid) % 8)::BIGINT AS cid,
         |         (min(d2 * 8 + cid) // 8)::BIGINT AS a2
         |  FROM dall GROUP BY vec_id),
         |alt AS (
         |  SELECT d.vec_id, min(d.d2)::BIGINT AS b2
         |  FROM dall d JOIN own o ON d.vec_id = o.vec_id AND d.cid <> o.cid
         |  GROUP BY d.vec_id),
         |sil AS (
         |  SELECT o.cid,
         |    floor(1000 * (sqrt(a.b2::DOUBLE) - sqrt(o.a2::DOUBLE))
         |      / sqrt(greatest(o.a2, a.b2, 1)::DOUBLE))::BIGINT AS spm
         |  FROM own o JOIN alt a ON o.vec_id = a.vec_id)
         |SELECT cid AS cell, count(*)::BIGINT AS n,
         |  (sum(spm) // count(*))::BIGINT AS mean_sil_pm
         |FROM sil GROUP BY cid ORDER BY cell""".stripMargin
  }

  val ivfAssignSql: String = qvecCte + kmeansCtes +
    s"""
       |SELECT vec_id, cid AS centroid
       |FROM a$kmeansIters ORDER BY vec_id""".stripMargin

  /** IVF cell-balance diagnostic — the pre-flight an ANN deployment reads
    * before setting nprobe/nCells (the [[graft.operators.TextOps.degreeHist]]
    * of the index world): per-cell population and permille share of the
    * corpus. A hot cell means probes touching it pay a near-linear scan
    * and the k-means fit should re-run with more cells or better init;
    * balanced cells (share ≈ 1000/nCells) certify the Σcell² compare-
    * volume math that SemDeDup and the IVF probes rely on.
    *
    * Scale: rides the existing fit + assignment; the diagnostic itself is
    * one mergeable count on the cell key plus a window over the nCells-row
    * aggregate (no corpus-sized second pass, no cross join).
    */
  def ivfBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    ivfAssignRaw(s, dir)
      .groupBy($"centroid")
      .agg(count(lit(1)).as("n_vec"))
      .withColumn("nv", sum($"n_vec").over(Window.partitionBy()))
      .select($"centroid", $"n_vec",
        floor($"n_vec" * lit(1000L) / $"nv").cast("long").as("share_pm"))
      .orderBy($"centroid")
  }

  val ivfBalanceSql: String = qvecCte + kmeansCtes +
    s"""
       |, cells AS (
       |  SELECT cid AS centroid, count(*)::BIGINT AS n_vec
       |  FROM a$kmeansIters GROUP BY cid)
       |SELECT centroid, n_vec,
       |  floor(n_vec * 1000 / (sum(n_vec) OVER ()))::BIGINT AS share_pm
       |FROM cells ORDER BY centroid""".stripMargin

  /** IVF top-3: brute-force cosine restricted to the query's cell. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame =
    ivfProbe(qEmb(s, dir).join(ivfAssignRaw(s, dir), Seq("vec_id")))

  /** The cell-probe tail shared by the inline-fit and saved-index paths:
    * input is the quantized frame with its cell assignment (vec_id, q, n2,
    * centroid); ONE maintained copy so the two probes can never drift.
    */
  private def ivfProbe(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"),
        $"centroid".as("qc"))
    emb.join(broadcast(queries),
        $"centroid" === $"qc" && $"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"cos", $"rn")
      .orderBy($"qid", $"rn")
  }

  /** Persist the fitted IVF index — the nCells-row centroid table and the
    * per-vector cell assignment — as [[graft.sources.VersionedTable]]
    * snapshots. This is the index LIFECYCLE a 100 TB deployment needs: fit
    * once (the expensive corpus pass), commit atomically, then serve
    * probes from the saved index without refitting; re-fits commit as new
    * versions, so a probe fleet can pin a version while a rebuild runs.
    * Assignments carry zone maps on the cell id: a single-cell probe scan
    * opens only the files holding that cell. Size `nCells` ≈ √N for a real
    * corpus (defaults match the gate queries' 8/2 pin).
    */
  def saveIvfIndex(s: SparkSession, dir: String, path: String,
      nCells: Int = 8, iters: Int = kmeansIters): Unit =
    saveIvfIndexOf(s, qEmb(s, dir), path, nCells, iters)

  /** [[saveIvfIndex]] over a caller-supplied quantized frame — lets the
    * refresh lifecycle spec fit an index on a base SUBSET and fold the
    * rest in as an append batch.
    */
  private[operators] def saveIvfIndexOf(s: SparkSession, emb: DataFrame,
      path: String, nCells: Int = 8, iters: Int = kmeansIters): Unit = {
    import s.implicits._
    import graft.sources.VersionedTable
    // ONE fit feeds both snapshots (the fit is the expensive corpus pass;
    // ivfCentroids checkpoints its nCells rows, so the assignment below
    // reuses the materialized result instead of refitting)
    val cents = ivfCentroids(s, emb, nCells, iters)
    // first fit inits version 0; a re-fit REPLACES as the next version —
    // a fit covers every key, and merge's keyed-upsert hash shuffle would
    // destroy the range clustering the centroid zone maps depend on
    def commit(df: DataFrame, p: String, statsCols: Seq[String]): Unit =
      if (VersionedTable.latestVersion(s, p).isEmpty)
        VersionedTable.init(df, p, statsCols = statsCols)
      else { VersionedTable.replace(s, p, df, statsCols = statsCols); () }
    commit(cents, s"$path/centroids", Nil)
    commit(ivfAssignOf(emb, cents, nCells)
        .repartitionByRange(4, $"centroid"),
      s"$path/assign", Seq("centroid"))
  }

  /** The ivfTopK probe served from a saved index instead of an inline fit:
    * same output, no k-means job — the only corpus work is the cell-match
    * join. Version -1 = latest.
    */
  def ivfTopKFromIndex(s: SparkSession, dir: String, path: String,
      version: Int = -1): DataFrame = {
    val assign = graft.sources.VersionedTable
      .read(s, s"$path/assign", version)
    ivfProbe(qEmb(s, dir).join(assign, Seq("vec_id")))
  }

  /** Mini-batch IVF refresh cells (Sculley, "Web-scale k-means
    * clustering", WWW 2010 — the fold-in update between full refits):
    * assign an APPEND batch to the EXISTING cells, then move each touched
    * centroid to the exact weighted mean of the stored cell mass (count ×
    * stored centroid — the index's own summary; the base corpus is never
    * rescanned) and the appended vectors:
    *
    *   c_new = floor((m_old·c_old + Σ_new e) / (m_old + n_new))
    *
    * per component, exact int64 arithmetic (products ≤ |q|·N ≪ 2^53, and
    * the one division is the repo's standard exact-double floor). Cells
    * the batch misses keep their centroid BIT-FOR-BIT; refresh never
    * creates cells — cell birth/retirement is a refit
    * ([[saveIvfIndexOf]]).
    *
    * Scale: the only corpus-sized work is the append assignment (one
    * broadcast-centroid pass over the batch) and one (cell, dim)-keyed
    * mergeable agg over the batch; everything downstream is
    * cells × dims.
    *
    * Output: one row per (cid, pos) with c_old, c_new, m_old, n_new.
    */
  private[operators] def ivfRefreshCells(cents: DataFrame, mOld: DataFrame,
      appends: DataFrame, nCells: Int = 8): DataFrame = {
    import cents.sparkSession.implicits._
    val aAssign = ivfAssignOf(appends, cents, nCells)
    val newSums = aAssign.join(appends, Seq("vec_id"))
      .select($"centroid".as("cid"), posexplode($"q").as(Seq("pos", "e")))
      .groupBy($"cid", $"pos")
      .agg(sum($"e").as("sn"), count(lit(1)).as("nn"))
    cents.select($"cid", posexplode($"cq").as(Seq("pos", "c_old")))
      .join(mOld, Seq("cid"), "left")
      .join(newSums, Seq("cid", "pos"), "left")
      .withColumn("m_old", coalesce($"m_old", lit(0L)))
      .withColumn("n_new", coalesce($"nn", lit(0L)))
      .withColumn("c_new", when($"n_new" > 0,
          floor(($"m_old" * $"c_old" + $"sn").cast("double")
            / ($"m_old" + $"n_new")).cast("long"))
        .otherwise($"c_old"))
      .select($"cid", $"pos", $"c_old", $"c_new", $"m_old", $"n_new")
  }

  /** Inverse fold: FORGET a delete-set from the fitted index — the
    * right-to-be-forgotten path of the index lifecycle (vectors must
    * leave not just the assignment table but the centroid statistics
    * their mass shaped). Exact inverse of [[ivfRefreshCells]]'s update:
    *
    *   c_new = floor((m_old·c_old − Σ_del e) / (m_old − n_del))
    *
    * per component, using only the index's own summary (count × stored
    * centroid) + the deleted vectors — no rescan of the surviving
    * corpus. Cells with no deletions keep their centroid BIT-FOR-BIT; a
    * cell whose members are ALL deleted keeps its last centroid (cell
    * retirement is a refit decision, same rule as cell birth in
    * refresh).
    */
  private[operators] def ivfForgetCells(cents: DataFrame, mOld: DataFrame,
      delSums: DataFrame): DataFrame = {
    import cents.sparkSession.implicits._
    cents.select($"cid", posexplode($"cq").as(Seq("pos", "c_old")))
      .join(mOld, Seq("cid"), "left")
      .join(delSums, Seq("cid", "pos"), "left")
      .withColumn("m_old", coalesce($"m_old", lit(0L)))
      .withColumn("n_del", coalesce($"nd", lit(0L)))
      .withColumn("c_new", when($"n_del" > 0 && $"m_old" > $"n_del",
          floor(($"m_old" * $"c_old" - $"sd").cast("double")
            / ($"m_old" - $"n_del")).cast("long"))
        .otherwise($"c_old"))
      .select($"cid", $"pos", $"c_old", $"c_new", $"m_old", $"n_del")
  }

  /** Gate query for the forget op: the index fit on the full corpus,
    * then vec_id % 10 = 7 deleted. ONE assignment pass feeds both the
    * per-cell mass table and the deletion sums (the delete-set's cells
    * are already in the fit's own assignment). Per cell: stored mass,
    * deleted mass, and how far the inverse fold moved the centroid.
    */
  def ivfForget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = qEmb(s, dir)
    val cents = ivfCentroids(s, all)
    val assign = ivfAssignOf(all, cents)
      .pin(true) // feeds the mass agg AND the delete sums
    val mOld = assign.groupBy($"centroid".as("cid"))
      .agg(count(lit(1)).as("m_old"))
    val delSums = assign.filter($"vec_id" % 10 === 7)
      .join(all, Seq("vec_id"))
      .select($"centroid".as("cid"), posexplode($"q").as(Seq("pos", "e")))
      .groupBy($"cid", $"pos")
      .agg(sum($"e").as("sd"), count(lit(1)).as("nd"))
    ivfForgetCells(cents, mOld, delSums)
      .groupBy($"cid")
      .agg(max($"m_old").as("m_old"), max($"n_del").as("n_del"),
        sum(($"c_new" - $"c_old") * ($"c_new" - $"c_old"))
          .as("forget_l2sq"))
      .orderBy($"cid")
  }

  val ivfForgetSql: String = qvecCte + kmeansCtes +
    s""",
       |mold AS (SELECT cid, count(*)::BIGINT AS m_old
       |         FROM a$kmeansIters GROUP BY cid),
       |ds AS (
       |  SELECT a.cid, u.i, sum(u.e)::BIGINT AS sd, count(*)::BIGINT AS nd
       |  FROM a$kmeansIters a JOIN (
       |    SELECT vec_id, unnest(q) AS e,
       |           generate_subscripts(q, 1) - 1 AS i
       |    FROM qv WHERE vec_id % 10 = 7) u
       |    ON a.vec_id = u.vec_id
       |  GROUP BY 1, 2),
       |ex AS (SELECT cid, unnest(cq) AS c_old,
       |              generate_subscripts(cq, 1) - 1 AS i
       |       FROM cent$kmeansIters),
       |upd AS (
       |  SELECT x.cid, x.i, x.c_old,
       |    CASE WHEN ds.nd IS NOT NULL AND coalesce(m.m_old, 0) > ds.nd
       |         THEN floor((coalesce(m.m_old, 0) * x.c_old - ds.sd)::DOUBLE
       |                    / (coalesce(m.m_old, 0) - ds.nd))::BIGINT
       |         ELSE x.c_old END AS c_new,
       |    coalesce(m.m_old, 0) AS m_old, coalesce(ds.nd, 0) AS nd
       |  FROM ex x LEFT JOIN mold m ON x.cid = m.cid
       |            LEFT JOIN ds ON x.cid = ds.cid AND x.i = ds.i)
       |SELECT cid, max(m_old)::BIGINT AS m_old, max(nd)::BIGINT AS n_del,
       |  sum((c_new - c_old) * (c_new - c_old))::BIGINT AS forget_l2sq
       |FROM upd GROUP BY cid ORDER BY cid""".stripMargin

  /** Gate query for the refresh op: base = vec_id % 4 ≠ 3 (the index as
    * fitted), appends = vec_id % 4 = 3 (the batch that arrived since).
    * Per cell: stored mass, appended mass, and how far the mini-batch
    * update moved the centroid (exact squared L2) — the refresh audit a
    * deployment reads before deciding whether drift warrants a refit.
    */
  def ivfRefresh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = qEmb(s, dir)
    val base = all.filter($"vec_id" % 4 =!= 3)
    val appends = all.filter($"vec_id" % 4 === 3)
    val cents = ivfCentroids(s, base)
    val mOld = ivfAssignOf(base, cents).groupBy($"centroid".as("cid"))
      .agg(count(lit(1)).as("m_old"))
    ivfRefreshCells(cents, mOld, appends)
      .groupBy($"cid")
      .agg(max($"m_old").as("m_old"), max($"n_new").as("n_new"),
        sum(($"c_new" - $"c_old") * ($"c_new" - $"c_old"))
          .as("refresh_l2sq"))
      .orderBy($"cid")
  }

  val ivfRefreshSql: String = qvecCte +
    ", qb AS (SELECT * FROM qv WHERE vec_id % 4 <> 3)" +
    ", qa AS (SELECT * FROM qv WHERE vec_id % 4 = 3)" +
    kmeansCtesOver("qb") +
    s""",
       |mold AS (SELECT cid, count(*)::BIGINT AS m_old
       |         FROM a$kmeansIters GROUP BY cid),
       |cnr AS (SELECT cid, sum(y * y)::BIGINT AS cn2
       |        FROM (SELECT cid, unnest(cq) AS y FROM cent$kmeansIters)
       |        GROUP BY cid),
       |cdr AS (
       |  SELECT vec_id, cid, sum(x * y)::BIGINT AS d FROM (
       |    SELECT e.vec_id, c.cid, unnest(e.q) AS x, unnest(c.cq) AS y
       |    FROM qa e CROSS JOIN cent$kmeansIters c) z
       |  GROUP BY 1, 2),
       |ar AS (
       |  SELECT cd.vec_id,
       |    (min((ne.n2 - 2 * cd.d + cn.cn2) * 8 + cd.cid) % 8)::BIGINT AS cid
       |  FROM cdr cd JOIN nrm ne ON cd.vec_id = ne.vec_id
       |              JOIN cnr cn ON cd.cid = cn.cid
       |  GROUP BY cd.vec_id),
       |ns AS (
       |  SELECT a.cid, u.i, sum(u.e)::BIGINT AS sn, count(*)::BIGINT AS nn
       |  FROM ar a JOIN (
       |    SELECT vec_id, unnest(q) AS e,
       |           generate_subscripts(q, 1) - 1 AS i FROM qa) u
       |    ON a.vec_id = u.vec_id
       |  GROUP BY 1, 2),
       |ex AS (SELECT cid, unnest(cq) AS c_old,
       |              generate_subscripts(cq, 1) - 1 AS i
       |       FROM cent$kmeansIters),
       |upd AS (
       |  SELECT x.cid, x.i, x.c_old,
       |    CASE WHEN ns.nn IS NOT NULL
       |         THEN floor((coalesce(m.m_old, 0) * x.c_old + ns.sn)::DOUBLE
       |                    / (coalesce(m.m_old, 0) + ns.nn))::BIGINT
       |         ELSE x.c_old END AS c_new,
       |    coalesce(m.m_old, 0) AS m_old, coalesce(ns.nn, 0) AS nn
       |  FROM ex x LEFT JOIN mold m ON x.cid = m.cid
       |            LEFT JOIN ns ON x.cid = ns.cid AND x.i = ns.i)
       |SELECT cid, max(m_old)::BIGINT AS m_old, max(nn)::BIGINT AS n_new,
       |  sum((c_new - c_old) * (c_new - c_old))::BIGINT AS refresh_l2sq
       |FROM upd GROUP BY cid ORDER BY cid""".stripMargin

  /** Fold an append batch into the PERSISTED index ([[saveIvfIndex]]'s
    * layout): assign appends against the saved centroids, mini-batch
    * update the touched cells ([[ivfRefreshCells]]), and commit the
    * refreshed centroids + the widened assignment as the NEXT
    * [[graft.sources.VersionedTable]] versions — probe fleets keep
    * pinning the old version while the refresh commits, completing the
    * save → drift-monitor ([[drift]]) → refresh lifecycle. A full refit
    * (which can also create/retire cells) commits via [[saveIvfIndex]].
    */
  def refreshIvfIndex(s: SparkSession, path: String, appends: DataFrame,
      nCells: Int = 8): Unit = {
    import s.implicits._
    import graft.sources.VersionedTable
    val cents = VersionedTable.read(s, s"$path/centroids")
    val assign = VersionedTable.read(s, s"$path/assign")
    val mOld = assign.groupBy($"centroid".as("cid"))
      .agg(count(lit(1)).as("m_old"))
    val cells = ivfRefreshCells(cents, mOld, appends, nCells)
      .pin(true) // cells × dims rows; feeds two commits
    val newCents = cells.groupBy($"cid")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c_new"))),
        x => x.getField("c_new")).as("cq"))
    val newAssign = assign
      .unionByName(ivfAssignOf(appends, cents, nCells))
    VersionedTable.replace(s, s"$path/centroids", newCents)
    VersionedTable.replace(s, s"$path/assign",
      newAssign.repartitionByRange(4, $"centroid"),
      statsCols = Seq("centroid"))
    ()
  }

  /** 2-means split refinement iterations — mirrored exactly by the
    * [[ivfSplitSql]] oracle CTEs (same role as [[kmeansIters]]).
    */
  private val splitIters = 2

  /** Per-cell deterministic farthest member from `anchor` (cid, aq):
    * maximize exact squared L2, tie-break smallest vec_id. Returns
    * (cid, `out` = that member's vector).
    */
  private def farthestFrom(mem: DataFrame, anchor: DataFrame,
      out: String): DataFrame = {
    import mem.sparkSession.implicits._
    mem.join(broadcast(anchor), Seq("cid"))
      .withColumn("d2",
        $"n2" - lit(2L) * dot($"q", $"aq") + norm2($"aq"))
      .groupBy($"cid")
      .agg(min_by($"q", struct((-$"d2").as("nd"), $"vec_id")).as(out))
  }

  /** Cell-local 2-means SPLIT — the index-side analogue of the
    * reference's load-triggered hash resize (`src/cuda/hashTable.cuh:
    * 120-154`, grow at 80% occupancy): a cell whose mass makes probes
    * near-linear is split into two children using ONLY that cell's
    * members (cell-local work — never a corpus pass).
    *
    * Seeding is the deterministic farthest-pair rule: child A seeds at
    * the member farthest from the parent centroid, child B at the member
    * farthest from A (ties to the smallest vec_id). `iters` Lloyd
    * rounds then refine (assignment: exact int64 squared L2, ties to
    * child A; update: per-component floor mean, the repo's standard
    * exact requantization; an empty child keeps its previous centroid —
    * the same rules as [[ivfCentroids]]).
    *
    * Input `members`: (cid, vec_id, q, n2) of the cells to split;
    * `cents`: (cid, cq) their parent centroids. Returns
    * (cells: one row per (cid, child 0|1) with final centroid `ccq` and
    * mass `m`; membership: (cid, vec_id, child) — the final
    * assignment, which [[splitIvfIndex]] uses to re-point the
    * assignment table).
    *
    * Scale: every stage is keyed by cid (or (cid, child, pos)) — the
    * split of one hot cell never shuffles another cell's members, and
    * the per-round state frames are ≤ 2·|cells| rows.
    */
  private[operators] def ivfSplit2Means(members: DataFrame,
      cents: DataFrame, iters: Int = splitIters)
      : (DataFrame, DataFrame) = {
    import members.sparkSession.implicits._
    val mem = members.pin(true) // re-read every round
    var ca = farthestFrom(mem, cents.select($"cid", $"cq".as("aq")), "sq")
      .select($"cid", $"sq".as("aq")).pin(true)
    var cb = farthestFrom(mem, ca.select($"cid", $"aq"), "sq")
      .select($"cid", $"sq".as("bq")).pin(true)
    // re-evaluated against the CURRENT (ca, cb) — the last evaluation
    // after the loop is the final assignment
    def assigned = mem
      .join(broadcast(ca), Seq("cid")).join(broadcast(cb), Seq("cid"))
      .withColumn("d2a", $"n2" - lit(2L) * dot($"q", $"aq") + norm2($"aq"))
      .withColumn("d2b", $"n2" - lit(2L) * dot($"q", $"bq") + norm2($"bq"))
      .withColumn("child",
        when($"d2a" <= $"d2b", lit(0L)).otherwise(lit(1L)))
    for (_ <- 1 to iters) {
      val next = assigned
        .select($"cid", $"child", posexplode($"q"))
        .groupBy($"cid", $"child", $"pos")
        .agg(sum($"col").as("sv"), count(lit(1)).as("m"))
        .withColumn("c", floor($"sv".cast("double") / $"m").cast("long"))
        .groupBy($"cid", $"child")
        .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
          x => x.getField("c")).as("cq2"))
        .pin(true) // ≤ 2·|cells| rows; feeds both children
      ca = ca.join(next.filter($"child" === 0L).select($"cid", $"cq2"),
          Seq("cid"), "left")
        .select($"cid", coalesce($"cq2", $"aq").as("aq"))
        .pin(true)
      cb = cb.join(next.filter($"child" === 1L).select($"cid", $"cq2"),
          Seq("cid"), "left")
        .select($"cid", coalesce($"cq2", $"bq").as("bq"))
        .pin(true)
    }
    val membership = assigned.select($"cid", $"vec_id", $"child")
      .pin(true) // masses here + re-pointing in the commit
    val masses = membership.groupBy($"cid", $"child")
      .agg(count(lit(1)).as("m"))
    val cells = ca.select($"cid", lit(0L).as("child"), $"aq".as("ccq"))
      .unionByName(cb.select($"cid", lit(1L).as("child"), $"bq".as("ccq")))
      .join(masses, Seq("cid", "child"), "left")
      .select($"cid", $"child", $"ccq", coalesce($"m", lit(0L)).as("m"))
    (cells, membership)
  }

  /** Gate query for the split op: the index fit on the full corpus, then
    * every ABOVE-AVERAGE cell (m·nCells > N — the cells
    * [[ivfBalance]] flags as hot) split by cell-local 2-means. Per split
    * cell: parent mass, both child masses, how far each child moved from
    * the parent centroid, and the separation between the children — the
    * audit a deployment reads to confirm the split actually relieved
    * the hot cell (m_a + m_b = m_before; sep_l2sq ≫ move_l2sq).
    */
  def ivfSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = qEmb(s, dir)
    val cents = ivfCentroids(s, all)
    val assign = ivfAssignOf(all, cents)
      .pin(true) // masses + the member fetch
    val hot = assign.groupBy($"centroid".as("cid"))
      .agg(count(lit(1)).as("m_before"))
      .withColumn("nv", sum($"m_before").over(Window.partitionBy()))
      .filter($"m_before" * 8L > $"nv")
      .select($"cid", $"m_before")
      .pin(true) // ≤ nCells rows; member filter + report
    val mem = assign.join(broadcast(hot.select($"cid")),
        $"centroid" === $"cid")
      .join(all, Seq("vec_id"))
      .select($"cid", $"vec_id", $"q", $"n2")
    val hotCents = cents.join(broadcast(hot.select($"cid")), Seq("cid"))
    val (cells, _) = ivfSplit2Means(mem, hotCents)
    val pex = hotCents
      .select($"cid", posexplode($"cq").as(Seq("pos", "c_par")))
    val cex = cells
      .select($"cid", $"child", posexplode($"ccq").as(Seq("pos", "c_ch")))
    val aex = cex.filter($"child" === 0L)
      .select($"cid", $"pos", $"c_ch".as("c_a"))
    val bex = cex.filter($"child" === 1L)
      .select($"cid", $"pos", $"c_ch".as("c_b"))
    val mv = pex.join(aex, Seq("cid", "pos")).join(bex, Seq("cid", "pos"))
      .groupBy($"cid")
      .agg(sum(($"c_a" - $"c_par") * ($"c_a" - $"c_par"))
          .as("move_a_l2sq"),
        sum(($"c_b" - $"c_par") * ($"c_b" - $"c_par"))
          .as("move_b_l2sq"),
        sum(($"c_a" - $"c_b") * ($"c_a" - $"c_b")).as("sep_l2sq"))
    val fm = cells.groupBy($"cid").agg(
      max(when($"child" === 0L, $"m")).as("m_a"),
      max(when($"child" === 1L, $"m")).as("m_b"))
    hot.join(fm, Seq("cid")).join(mv, Seq("cid"))
      .select($"cid", $"m_before", $"m_a", $"m_b",
        $"move_a_l2sq", $"move_b_l2sq", $"sep_l2sq")
      .orderBy($"cid")
  }

  /** SQL mirror of the split: seeds (farthest-from-parent, then
    * farthest-from-A), `splitIters` Lloyd rounds, final assignment —
    * the same CTE-per-iteration scheme as [[kmeansCtesOver]].
    */
  val ivfSplitSql: String = {
    val sb = new StringBuilder
    sb ++= qvecCte + kmeansCtes
    sb ++=
      s""",
         |mass AS MATERIALIZED (SELECT cid, count(*)::BIGINT AS m
         |         FROM a$kmeansIters GROUP BY cid),
         |hot AS MATERIALIZED (SELECT cid, m AS m_before FROM mass
         |        WHERE m * 8 > (SELECT sum(m) FROM mass)),
         |mem AS MATERIALIZED (SELECT a.cid, a.vec_id, qv.q, n.n2
         |        FROM a$kmeansIters a JOIN qv USING (vec_id)
         |             JOIN nrm n USING (vec_id)
         |        WHERE a.cid IN (SELECT cid FROM hot)),
         |hc AS MATERIALIZED (SELECT cid, cq FROM cent$kmeansIters
         |       WHERE cid IN (SELECT cid FROM hot)),
         |pn AS MATERIALIZED (SELECT cid, sum(y * y)::BIGINT AS pn2
         |       FROM (SELECT cid, unnest(cq) AS y FROM hc) GROUP BY cid),
         |pd AS MATERIALIZED (SELECT cid, vec_id, sum(x * y)::BIGINT AS d FROM (
         |    SELECT m.cid, m.vec_id, unnest(m.q) AS x, unnest(c.cq) AS y
         |    FROM mem m JOIN hc c USING (cid)) z GROUP BY 1, 2),
         |sa AS MATERIALIZED (SELECT cid, vec_id FROM (
         |    SELECT pd.cid, pd.vec_id, row_number() OVER (
         |        PARTITION BY pd.cid
         |        ORDER BY (n.n2 - 2 * pd.d + pn.pn2) DESC, pd.vec_id)
         |      AS rn
         |    FROM pd JOIN nrm n ON pd.vec_id = n.vec_id
         |            JOIN pn USING (cid)) t WHERE rn = 1),
         |ca0 AS MATERIALIZED (SELECT sa.cid, qv.q AS aq
         |        FROM sa JOIN qv ON sa.vec_id = qv.vec_id),
         |sn0 AS MATERIALIZED (SELECT cid, sum(y * y)::BIGINT AS an2
         |        FROM (SELECT cid, unnest(aq) AS y FROM ca0) GROUP BY cid),
         |sd0 AS MATERIALIZED (SELECT cid, vec_id, sum(x * y)::BIGINT AS d FROM (
         |    SELECT m.cid, m.vec_id, unnest(m.q) AS x, unnest(c.aq) AS y
         |    FROM mem m JOIN ca0 c USING (cid)) z GROUP BY 1, 2),
         |sb_ AS MATERIALIZED (SELECT cid, vec_id FROM (
         |    SELECT sd0.cid, sd0.vec_id, row_number() OVER (
         |        PARTITION BY sd0.cid
         |        ORDER BY (n.n2 - 2 * sd0.d + s.an2) DESC, sd0.vec_id)
         |      AS rn
         |    FROM sd0 JOIN nrm n ON sd0.vec_id = n.vec_id
         |             JOIN sn0 s USING (cid)) t WHERE rn = 1),
         |cb0 AS MATERIALIZED (SELECT sb_.cid, qv.q AS bq
         |        FROM sb_ JOIN qv ON sb_.vec_id = qv.vec_id)""".stripMargin
    for (t <- 0 to splitIters) {
      sb ++=
        s""",
           |an$t AS MATERIALIZED (SELECT cid, sum(y * y)::BIGINT AS an2
           |  FROM (SELECT cid, unnest(aq) AS y FROM ca$t) GROUP BY cid),
           |bn$t AS MATERIALIZED (SELECT cid, sum(y * y)::BIGINT AS bn2
           |  FROM (SELECT cid, unnest(bq) AS y FROM cb$t) GROUP BY cid),
           |ad$t AS MATERIALIZED (SELECT cid, vec_id, sum(x * y)::BIGINT AS d FROM (
           |    SELECT m.cid, m.vec_id, unnest(m.q) AS x, unnest(c.aq) AS y
           |    FROM mem m JOIN ca$t c USING (cid)) z GROUP BY 1, 2),
           |bd$t AS MATERIALIZED (SELECT cid, vec_id, sum(x * y)::BIGINT AS d FROM (
           |    SELECT m.cid, m.vec_id, unnest(m.q) AS x, unnest(c.bq) AS y
           |    FROM mem m JOIN cb$t c USING (cid)) z GROUP BY 1, 2),
           |asg$t AS MATERIALIZED (
           |  SELECT m.cid, m.vec_id,
           |    CASE WHEN (n.n2 - 2 * ad.d + an.an2)
           |              <= (n.n2 - 2 * bd.d + bn.bn2)
           |         THEN 0 ELSE 1 END AS child
           |  FROM mem m JOIN nrm n ON m.vec_id = n.vec_id
           |    JOIN ad$t ad ON m.cid = ad.cid AND m.vec_id = ad.vec_id
           |    JOIN bd$t bd ON m.cid = bd.cid AND m.vec_id = bd.vec_id
           |    JOIN an$t an ON m.cid = an.cid
           |    JOIN bn$t bn ON m.cid = bn.cid)""".stripMargin
      if (t < splitIters) {
        sb ++=
          s""",
             |cs${t + 1} AS MATERIALIZED (
             |  SELECT a.cid, a.child, u.i, sum(u.e)::BIGINT AS s,
             |         count(*)::BIGINT AS m
             |  FROM asg$t a JOIN (
             |    SELECT vec_id, unnest(q) AS e,
             |           generate_subscripts(q, 1) - 1 AS i FROM qv) u
             |    ON a.vec_id = u.vec_id
             |  GROUP BY 1, 2, 3),
             |ck${t + 1} AS MATERIALIZED (
             |  SELECT cid, child,
             |         list(floor(s::DOUBLE / m)::BIGINT ORDER BY i) AS cq
             |  FROM cs${t + 1} GROUP BY cid, child),
             |ca${t + 1} AS MATERIALIZED (SELECT p.cid, coalesce(c.cq, p.aq) AS aq
             |  FROM ca$t p LEFT JOIN (SELECT * FROM ck${t + 1}
             |                         WHERE child = 0) c USING (cid)),
             |cb${t + 1} AS MATERIALIZED (SELECT p.cid, coalesce(c.cq, p.bq) AS bq
             |  FROM cb$t p LEFT JOIN (SELECT * FROM ck${t + 1}
             |                         WHERE child = 1) c USING (cid))""".stripMargin
      }
    }
    sb ++=
      s""",
         |fm AS MATERIALIZED (SELECT cid, child, count(*)::BIGINT AS m
         |       FROM asg$splitIters GROUP BY 1, 2),
         |pex AS MATERIALIZED (SELECT cid, unnest(cq) AS c_par,
         |               generate_subscripts(cq, 1) - 1 AS i FROM hc),
         |aex AS MATERIALIZED (SELECT cid, unnest(aq) AS c_a,
         |               generate_subscripts(aq, 1) - 1 AS i
         |        FROM ca$splitIters),
         |bex AS MATERIALIZED (SELECT cid, unnest(bq) AS c_b,
         |               generate_subscripts(bq, 1) - 1 AS i
         |        FROM cb$splitIters),
         |mv AS MATERIALIZED (SELECT p.cid,
         |    sum((a.c_a - p.c_par) * (a.c_a - p.c_par))::BIGINT
         |      AS move_a_l2sq,
         |    sum((b.c_b - p.c_par) * (b.c_b - p.c_par))::BIGINT
         |      AS move_b_l2sq,
         |    sum((a.c_a - b.c_b) * (a.c_a - b.c_b))::BIGINT AS sep_l2sq
         |  FROM pex p JOIN aex a ON p.cid = a.cid AND p.i = a.i
         |             JOIN bex b ON p.cid = b.cid AND p.i = b.i
         |  GROUP BY p.cid)
         |SELECT h.cid, h.m_before::BIGINT AS m_before,
         |  coalesce(f0.m, 0)::BIGINT AS m_a,
         |  coalesce(f1.m, 0)::BIGINT AS m_b,
         |  mv.move_a_l2sq, mv.move_b_l2sq, mv.sep_l2sq
         |FROM hot h
         |LEFT JOIN (SELECT * FROM fm WHERE child = 0) f0 USING (cid)
         |LEFT JOIN (SELECT * FROM fm WHERE child = 1) f1 USING (cid)
         |JOIN mv USING (cid)
         |ORDER BY cid""".stripMargin
    sb.toString
  }

  /** Split every hot cell of the PERSISTED index ([[saveIvfIndex]]'s
    * layout) and RETIRE empty cells, committing the result as the next
    * [[graft.sources.VersionedTable]] versions — the load-factor
    * lifecycle event between refits (the reference's store resizes at
    * 80% occupancy, `src/cuda/hashTable.cuh:120-154`; an IVF index's
    * equivalent pressure is a cell whose mass makes probing it
    * near-linear, and its equivalent of freed slots is a cell whose
    * members have all been forgotten).
    *
    * Hot rule: mass · |cells| > N (above-average — the cells
    * [[ivfBalance]] flags). Child A keeps the parent cid; child B gets
    * `max(cid) + rank` (deterministic, collision-free). Cells with ZERO
    * assignment rows (all members deleted since the fit) are dropped
    * from the committed centroid table. Untouched cells commit their
    * centroid row BIT-FOR-BIT (IvfSplitSpec law). `emb` supplies the
    * member vectors (the index stores assignments, not vectors) — only
    * hot-cell members are ever fetched from it.
    */
  def splitIvfIndex(s: SparkSession, path: String,
      emb: DataFrame): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.sources.VersionedTable
    val cents = VersionedTable.read(s, s"$path/centroids")
      .pin(true)
    val assign = VersionedTable.read(s, s"$path/assign")
      .pin(true)
    val masses = assign.groupBy($"centroid".as("cid"))
      .agg(count(lit(1)).as("m"))
      .pin(true) // ≤ |cells| rows; hot filter + retire filter
    val nCells = cents.count()
    val hot = masses
      .withColumn("nv", sum($"m").over(Window.partitionBy()))
      .filter($"m" * lit(nCells) > $"nv")
      .select($"cid").pin(true)
    val mem = assign.join(broadcast(hot), $"centroid" === $"cid")
      .join(emb, Seq("vec_id"))
      .select($"cid", $"vec_id", $"q", $"n2")
    val hotCents = cents.join(broadcast(hot), Seq("cid"))
    val (cells, membership) = ivfSplit2Means(mem, hotCents)
    val maxCid = cents.agg(max($"cid")).head().getLong(0)
    // bounded |cells|-row window: deterministic fresh ids for child B
    val newIds = hot
      .withColumn("bcid", lit(maxCid) + row_number().over(
        Window.orderBy($"cid")))
      .pin(true)
    val childCents = cells.join(broadcast(newIds), Seq("cid"))
      .select(when($"child" === 0L, $"cid").otherwise($"bcid").as("cid"),
        $"ccq".as("cq"))
    // survivors: populated, un-split cells keep their row bit-for-bit;
    // empty cells (m = 0 ⇔ absent from the mass table) retire here
    val keep = cents
      .join(broadcast(masses.filter($"m" > 0).select($"cid")), Seq("cid"))
      .join(broadcast(hot), Seq("cid"), "left_anti")
    val rePointed = assign.join(
        membership.join(broadcast(newIds), Seq("cid"))
          .select($"vec_id",
            when($"child" === 0L, $"cid").otherwise($"bcid").as("nc")),
        Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"nc", $"centroid").as("centroid"))
    VersionedTable.replace(s, s"$path/centroids",
      keep.unionByName(childCents))
    VersionedTable.replace(s, s"$path/assign",
      rePointed.repartitionByRange(4, $"centroid"),
      statsCols = Seq("centroid"))
    ()
  }

  val ivfTopKSql: String = qvecCte + kmeansCtes +
    s""",
       |assign AS (SELECT vec_id, cid AS centroid FROM a$kmeansIters),
       |dots AS (""".stripMargin +
    """
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT qv.vec_id, qv.q, a.centroid FROM qv
      |          JOIN assign a ON qv.vec_id = a.vec_id WHERE qv.vec_id < 10) q
      |    JOIN (SELECT qv.vec_id, qv.q, a.centroid FROM qv
      |          JOIN assign a ON qv.vec_id = a.vec_id) e
      |      ON q.centroid = e.centroid AND e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT qid, d.vec_id,
      |    round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |  FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |              JOIN nrm ne ON d.vec_id = ne.vec_id)
      |SELECT qid, vec_id, cos, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos DESC, vec_id) AS rn FROM scored) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** Embedding DRIFT monitor: split the corpus into two deterministic
    * snapshots (vec_id parity — standing in for "last week's embeddings
    * vs this week's" or "model v1 vs v2") and report, per label, the
    * squared L2 distance between the snapshots' class centroids. This is
    * the re-embedding regression check a production vector store runs
    * before swapping an index: a label whose centroid moved far needs its
    * cluster thresholds (SemDeDup radii, ANN probe settings) revalidated.
    * Fully integer: quantized sums, floored means, exact squared diffs —
    * the drift number is bit-reproducible across engines and runs.
    *
    * Scale: same posexplode + (label, snap, dim)-keyed mergeable agg as
    * [[labelCentroids]] (bounded state: labels × 2 × dims), then a
    * labels×dims-sized join — nothing downstream of the one corpus pass
    * grows with data.
    */
  def drift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cent = Tables.embeddings(s, dir)
      .select($"label", ($"vec_id" % 2).as("snap"),
        posexplode(qvec($"embedding")).as(Seq("d", "e")))
      .groupBy($"label", $"snap", $"d")
      .agg(count(lit(1)).as("n"), sum($"e").as("se"))
      .withColumn("m", floor($"se".cast("double") / $"n").cast("long"))
    val a = cent.filter($"snap" === 0)
      .select($"label", $"d", $"m".as("ma"), $"n".as("na"))
    val b = cent.filter($"snap" === 1)
      .select($"label", $"d", $"m".as("mb"), $"n".as("nb"))
    a.join(b, Seq("label", "d"))
      .groupBy($"label".cast("long").as("label"))
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        sum(($"ma" - $"mb") * ($"ma" - $"mb")).as("drift_l2sq"))
      .orderBy($"label")
  }

  val driftSql: String =
    """WITH qv AS (
      |  SELECT label, vec_id % 2 AS snap,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |ex AS (SELECT label, snap, unnest(q) AS e,
      |              generate_subscripts(q, 1) - 1 AS d FROM qv),
      |c AS (SELECT label, snap, d, count(*)::BIGINT AS n,
      |        floor(sum(e)::DOUBLE / count(*))::BIGINT AS m
      |      FROM ex GROUP BY 1, 2, 3)
      |SELECT a.label::BIGINT AS label,
      |  max(a.n)::BIGINT AS n_a, max(b.n)::BIGINT AS n_b,
      |  sum((a.m - b.m) * (a.m - b.m))::BIGINT AS drift_l2sq
      |FROM c a JOIN c b ON a.label = b.label AND a.d = b.d
      |  AND a.snap = 0 AND b.snap = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-label centroids of the embedding column, one row per (label,
    * dimension) — the class-prototype aggregation of embedding-space
    * analysis (cluster quality, label drift, nearest-class-mean
    * classification). Fixed-point quantization keeps sums exact int64
    * (2^53/2e4 ≈ 4.5e11 rows per label before the double mean could lose a
    * ULP — beyond any per-label corpus here). posexplode fans each vector
    * into 64 (dim, value) rows map-side; the agg groups on (label, dim) —
    * bounded state (labels × dims), one shuffle, map-side partials.
    */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label", posexplode(qvec($"embedding")).as(Seq("d", "e")))
      .groupBy($"label", $"d")
      .agg(count(lit(1)).as("n"), sum($"e").as("sum_e"))
      .select($"label".cast("long").as("label"), $"d".cast("long").as("d"),
        $"n", $"sum_e",
        floor($"sum_e".cast("double") / $"n").cast("long").as("mean_e"))
      .orderBy($"label", $"d")
  }

  val labelCentroidsSql: String =
    """WITH qv AS (
      |  SELECT label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |ex AS (SELECT label, unnest(q) AS e,
      |              generate_subscripts(q, 1) - 1 AS d FROM qv)
      |SELECT label::BIGINT AS label, d::BIGINT AS d, count(*)::BIGINT AS n,
      |  sum(e)::BIGINT AS sum_e,
      |  floor(sum(e)::DOUBLE / count(*))::BIGINT AS mean_e
      |FROM ex GROUP BY label, d ORDER BY label, d""".stripMargin

  /** ANN self-evaluation: recall@3 of the hyperplane-LSH top-3 against the
    * exact brute-force top-3, per query vector — the measurement loop any
    * production ANN deployment runs before trusting the index. Both sides
    * are truncated to the SAME k (the exact query returns top-5; comparing
    * against approx's top-3 untruncated would cap "recall" at 3/5 and make
    * a perfect index read as 0.6). Pure integer output (exact hits over
    * candidate counts; the division is left to the reader so no float
    * crosses engines). Left join keeps queries whose LSH bucket returned
    * nothing (recall 0), which is exactly the failure this query exists to
    * expose.
    */
  def lshRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = cosineTopK(s, dir).filter($"rn" <= 3).select($"qid", $"vec_id")
    val approx = lshTopK(s, dir)
      // one pass: the approx subtree feeds both the hits join and the
      // returned-count aggregate below
      .pin()
      .select($"qid".as("aqid"), $"vec_id".as("avid"))
    val hits = exact.join(approx,
        $"qid" === $"aqid" && $"vec_id" === $"avid", "left")
      .groupBy($"qid")
      .agg(count(lit(1)).as("n_exact"), count($"avid").as("n_hit"))
    val returned = approx.groupBy($"aqid".as("qid"))
      .agg(count(lit(1)).as("n_returned"))
    hits.join(returned, Seq("qid"), "left")
      .select($"qid", $"n_exact", $"n_hit",
        coalesce($"n_returned", lit(0L)).as("n_returned"))
      .orderBy($"qid")
  }

  val lshRecallSql: String =
    s"""WITH e0 AS ($cosineTopKSql),
       |e AS (SELECT * FROM e0 WHERE rn <= 3),
       |a AS ($lshTopKSql),
       |hits AS (
       |  SELECT e.qid, count(*)::BIGINT AS n_exact,
       |    count(a.vec_id)::BIGINT AS n_hit
       |  FROM e LEFT JOIN a ON e.qid = a.qid AND e.vec_id = a.vec_id
       |  GROUP BY e.qid),
       |ret AS (SELECT qid, count(*)::BIGINT AS n_returned FROM a GROUP BY qid)
       |SELECT h.qid, h.n_exact, h.n_hit,
       |  coalesce(r.n_returned, 0)::BIGINT AS n_returned
       |FROM hits h LEFT JOIN ret r ON h.qid = r.qid
       |ORDER BY h.qid""".stripMargin

  /** ANN self-evaluation for IVF, mirroring [[lshRecall]]: recall@3 of the
    * cell-probe top-3 against the exact brute-force top-3, per query vector
    * and per nprobe ∈ {1, 2} — nprobe=1 reads only the query's nearest
    * cell (the cheapest probe, [[ivfTopK]]'s configuration), nprobe=2 adds
    * the second-nearest, which is the standard recall lever when a query
    * lands near a Voronoi boundary and its true neighbors sit one cell
    * over. ONE k-means fit and ONE corpus cell assignment feed both probe
    * settings (the fit is the expensive pass; only the bounded per-cell
    * candidate joins differ), and the exact side is computed once. Same
    * integer-only output contract as lshRecall: hits over counts, division
    * left to the reader.
    */
  def ivfRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val cents = ivfCentroids(s, emb) // checkpointed 8 rows
    // corpus side: one assignment pass, materialized — both nprobe probes
    // (and nothing else) read it
    val withCell = emb.join(ivfAssignOf(emb, cents), Seq("vec_id"))
      .pin(true)
    // per query: ALL centroids ranked by exact integer distance; each
    // nprobe setting keeps a prefix of the same ranking
    val withN = broadcast(cents.withColumn("cn2", norm2($"cq")))
    val qcells = withCell.filter($"vec_id" < 10)
      .crossJoin(withN)
      .withColumn("d2", $"n2" - lit(2L) * dot($"q", $"cq") + $"cn2")
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"d2", $"cid")))
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"),
        $"cid".as("qc"), $"cell_rank")
      .pin(true)
    val exact = cosineTopK(s, dir).filter($"rn" <= 3)
      .select($"qid", $"vec_id").pin(true)
    val perNprobe = Seq(1, 2).map { np =>
      val approx = withCell.join(
          broadcast(qcells.filter($"cell_rank" <= np)),
          $"centroid" === $"qc" && $"vec_id" =!= $"qid")
        .withColumn("cos",
          round(dot($"q", $"qq").cast("double")
            / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
        .filter($"rn" <= 3)
        // one pass: feeds both the hits join and the returned-count agg
        .select($"qid".as("aqid"), $"vec_id".as("avid"))
        .pin()
      val hits = exact.join(approx,
          $"qid" === $"aqid" && $"vec_id" === $"avid", "left")
        .groupBy($"qid")
        .agg(count(lit(1)).as("n_exact"), count($"avid").as("n_hit"))
      val returned = approx.groupBy($"aqid".as("qid"))
        .agg(count(lit(1)).as("n_returned"))
      hits.join(returned, Seq("qid"), "left")
        .select(lit(np).as("nprobe"), $"qid", $"n_exact", $"n_hit",
          coalesce($"n_returned", lit(0L)).as("n_returned"))
    }
    perNprobe.reduce(_ unionByName _).orderBy($"nprobe", $"qid")
  }

  /** SQL mirror: shared qv/kmeans/exact CTEs, then one probe branch per
    * nprobe over the same ranked query-cell CTE.
    */
  val ivfRecallSql: String = {
    def probe(np: Int) =
      s""",
         |dots$np AS (
         |  SELECT qid, vec_id, sum(x * y) AS d FROM (
         |    SELECT q.qid, e.vec_id, unnest(q.q) AS x, unnest(e.q) AS y
         |    FROM (SELECT c.qid, qv.q, c.cid FROM qcells c
         |          JOIN qv ON qv.vec_id = c.qid WHERE c.cell_rank <= $np) q
         |    JOIN (SELECT qv.vec_id, qv.q, a.cid FROM qv
         |          JOIN a$kmeansIters a ON qv.vec_id = a.vec_id) e
         |      ON q.cid = e.cid AND e.vec_id <> q.qid) z
         |  GROUP BY 1, 2),
         |top$np AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, d.vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC,
         |        d.vec_id) AS rn
         |    FROM dots$np d JOIN nrm nq ON d.qid = nq.vec_id
         |                   JOIN nrm ne ON d.vec_id = ne.vec_id) t
         |  WHERE rn <= 3),
         |hit$np AS (
         |  SELECT e.qid, count(*)::BIGINT AS n_exact,
         |    count(t.vec_id)::BIGINT AS n_hit
         |  FROM exact3 e LEFT JOIN top$np t
         |    ON e.qid = t.qid AND e.vec_id = t.vec_id
         |  GROUP BY e.qid),
         |rec$np AS (
         |  SELECT $np AS nprobe, h.qid, h.n_exact, h.n_hit,
         |    coalesce(r.n_returned, 0)::BIGINT AS n_returned
         |  FROM hit$np h LEFT JOIN (
         |    SELECT qid, count(*)::BIGINT AS n_returned
         |    FROM top$np GROUP BY qid) r ON h.qid = r.qid)""".stripMargin
    qvecCte + kmeansCtes +
      s""",
         |qcells AS (
         |  SELECT cd.vec_id AS qid, cd.cid,
         |    row_number() OVER (PARTITION BY cd.vec_id
         |      ORDER BY ne.n2 - 2 * cd.d + cn.cn2, cd.cid) AS cell_rank
         |  FROM cd$kmeansIters cd
         |  JOIN nrm ne ON cd.vec_id = ne.vec_id
         |  JOIN cn$kmeansIters cn ON cd.cid = cn.cid
         |  WHERE cd.vec_id < 10),
         |edots AS (
         |  SELECT qid, vec_id, sum(x * y) AS d FROM (
         |    SELECT q.vec_id AS qid, e.vec_id,
         |           unnest(q.q) AS x, unnest(e.q) AS y
         |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
         |    JOIN qv e ON e.vec_id <> q.vec_id) z
         |  GROUP BY 1, 2),
         |exact3 AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, d.vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC,
         |        d.vec_id) AS rn
         |    FROM edots d JOIN nrm nq ON d.qid = nq.vec_id
         |                 JOIN nrm ne ON d.vec_id = ne.vec_id) t
         |  WHERE rn <= 3)""".stripMargin +
      probe(1) + probe(2) +
      """
        |SELECT * FROM rec1 UNION ALL SELECT * FROM rec2
        |ORDER BY nprobe, qid""".stripMargin
  }

  /** Int8 symmetric quantization of the embedding column — the compression
    * step a 100 TB embedding store runs before ANN indexing (4× smaller
    * than float32, 8× smaller than the int64 grid). Per vector: scale =
    * ceil(max|x|/127) on the fixed-point grid, code_i = floor(x_i/scale) ∈
    * [-128, 127]; the reported residual sum(x_i - code_i*scale) =
    * sum(floor-mod(x_i, scale)) is integer-exact in both engines, so the
    * per-label quality stats hash-match DuckDB bit-for-bit (same contract
    * as the cosine queries: all arithmetic on the int grid).
    * Scale: one narrow map stage + one tiny (per-label) aggregation — no
    * join, no per-row state; the natural shape for a full-corpus pass.
    */
  def quantizeErr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label", qvec($"embedding").as("q"))
      .withColumn("amax",
        array_max(transform($"q", e => abs(e))))
      .withColumn("qscale",
        greatest(lit(1L), floor(($"amax" + lit(126L)) / lit(127)).cast("long")))
      .withColumn("err",
        aggregate(transform($"q", e => pmod(e, $"qscale")),
          lit(0L), (acc, x) => acc + x))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vec"),
        round(avg($"err"), 3).as("avg_err"),
        max($"err").as("max_err"),
        round(avg($"qscale"), 3).as("avg_scale"))
      .orderBy($"label")
  }

  val quantizeErrSql: String =
    """WITH qv AS (
      |  SELECT label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |pv AS (
      |  SELECT label, q,
      |    greatest(1, floor((list_max([abs(e) FOR e IN q]) + 126) / 127)::BIGINT)
      |      AS qscale
      |  FROM qv),
      |ev AS (
      |  SELECT label, qscale,
      |    list_sum([((e % qscale) + qscale) % qscale FOR e IN q])::BIGINT AS err
      |  FROM pv)
      |SELECT label, count(*)::BIGINT AS n_vec, round(avg(err), 3) AS avg_err,
      |  max(err)::BIGINT AS max_err, round(avg(qscale), 3) AS avg_scale
      |FROM ev GROUP BY label ORDER BY label""".stripMargin

  // ---- Product quantization (PQ / ADC) ----

  /** Gate-pinned PQ geometry: M=4 subspaces × 16 dims (the 64-dim
    * embedding), k=8 centroids per subspace (nbits=3),
    * [[kmeansIters]] Lloyd iterations — the same determinism contract as
    * the IVF fit, so the oracle reproduces every code bit-for-bit. The
    * fit/encode kernels below take (m, k) as parameters — a 100 TB
    * deployment tunes the memory/recall trade (bytes per vector = M·nbits
    * /8; LUT adds per probe = M) without touching the gate, exactly as
    * the IVF cell count was parameterized. PqGeometrySpec pins the
    * algebraic laws across geometries.
    */
  private val pqM = 4
  private val pqK = 8
  private val embDim = 64
  private val pqDims = embDim / pqM // the oracle CTEs render the gate geometry

  /** Subvector frame (vec_id, m, sq, sn2): each vector exploded into its
    * M subspace slices. ONE frame feeds the codebook fit, the corpus
    * encode, and the query LUT. `m` must divide the embedding dim.
    */
  private def pqSub(emb: DataFrame, mSub: Int = pqM): DataFrame = {
    import emb.sparkSession.implicits._
    require(embDim % mSub == 0, s"pq M=$mSub must divide dim $embDim")
    val dims = embDim / mSub
    emb.select($"vec_id", explode(array((0 until mSub).map { m =>
        struct(lit(m.toLong).as("m"),
          slice($"q", m * dims + 1, dims).as("sq"))
      }: _*)).as("e"))
      .select($"vec_id", $"e.m".as("m"), $"e.sq".as("sq"))
      .withColumn("sn2", norm2($"sq"))
  }

  /** PQ codebook (Jégou, Douze, Schmid, "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): an independent k-means per subspace —
    * run here as ONE k-means keyed (m, cid), so all M fits ride the same
    * jobs: the per-iteration cost is a broadcast join + two aggregations
    * regardless of M, and no driver loop over subspaces exists. Same
    * integer-exact floor-mean requantization as [[ivfCentroids]]. Output:
    * the M×k codebook (m, cid, cq), checkpointed (32 rows).
    */
  private def pqCodebook(sub: DataFrame, kCents: Int = pqK): DataFrame = {
    import sub.sparkSession.implicits._
    val k = lit(kCents.toLong)
    var cents = sub.filter($"vec_id" < kCents)
      .select($"m", $"vec_id".as("cid"), $"sq".as("cq"))
    for (_ <- 1 to kmeansIters) {
      val withN = broadcast(cents.withColumn("cn2", norm2($"cq")))
      // same two moves as [[ivfCentroids]]: carry sq through the
      // assignment aggregate (first() over identical per-group copies)
      // instead of re-joining the corpus-sized sub frame, and pin the
      // M×k-row codebook every iteration (bounded at any corpus size) so
      // the per-iteration double reference (broadcast side + carry join)
      // cannot nest into ~2^iters scans of the pinned sub frame.
      val assigned = sub.join(withN, Seq("m"))
        .withColumn("d2", $"sn2" - lit(2L) * dot($"sq", $"cq") + $"cn2")
        .groupBy($"vec_id", $"m")
        .agg((min($"d2" * k + $"cid") % k).as("cid"), first($"sq").as("sq"))
      val sums = assigned
        .select($"m", $"cid", posexplode($"sq"))
        .groupBy($"m", $"cid", $"pos")
        .agg(sum($"col").as("sv"), count(lit(1)).as("cnt"))
        .withColumn("c", floor($"sv".cast("double") / $"cnt").cast("long"))
      val next = sums.groupBy($"m", $"cid")
        .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
          x => x.getField("c")).as("cq2"))
      cents = cents.join(next, Seq("m", "cid"), "left")
        .select($"m", $"cid", coalesce($"cq2", $"cq").as("cq"))
        .pin(true)
    }
    if (kmeansIters <= 0) cents.pin(true) else cents
  }

  /** The ADC (asymmetric distance computation) top-3: corpus vectors are
    * collapsed to M=4 one-byte codes (128× smaller than the int64 grid —
    * the memory story that makes billion-scale ANN fit in RAM), queries
    * stay exact, and the approximate distance is the sum of M lookup-table
    * entries ‖q_m − c_{m,code_m}‖². All integer: the LUT is 10 queries ×
    * 32 codebook cells = 320 exact-int64 rows, broadcast; scoring is a
    * broadcast equi-join on (m, cid) + a map-side-combinable sum — the
    * corpus is touched once, narrow, no shuffle beyond the per-(qid,vec)
    * 4-row sum. At 100 TB the codes table IS the index: 4 bytes/vector.
    */
  private[graft] def pqAdcTop3(s: SparkSession, dir: String,
      mSub: Int = pqM, kCents: Int = pqK): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (codes, lut) = pqCodesAndLut(s, dir, mSub, kCents)
    codes.join(broadcast(lut), Seq("m", "cid"))
      .filter($"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id")
      .agg(sum($"qd2").as("d2_adc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2_adc", $"vec_id")))
      .filter($"rn" <= 3)
  }

  /** The PQ encode shared by the flat-ADC and IVF-PQ probes: the corpus
    * code table (vec_id, m, cid) and the query LUT (qid, m, cid, qd2 =
    * exact ‖q_m − c_{m,cid}‖² for EVERY codebook cell — so a code row
    * matches exactly one LUT row per subspace and the ADC sum is always
    * complete). ONE maintained encode so the two probes can never drift.
    */
  private[graft] def pqCodesAndLut(s: SparkSession, dir: String,
      mSub: Int = pqM, kCents: Int = pqK): (DataFrame, DataFrame) = {
    import s.implicits._
    val sub = pqSub(qEmb(s, dir), mSub).pin(true)
    val book = pqCodebook(sub, kCents)
    val withN = broadcast(book.withColumn("cn2", norm2($"cq")))
    val d2 = $"sn2" - lit(2L) * dot($"sq", $"cq") + $"cn2"
    val k = lit(kCents.toLong)
    val codes = sub.join(withN, Seq("m"))
      .withColumn("d2", d2)
      .groupBy($"vec_id", $"m")
      .agg((min($"d2" * k + $"cid") % k).as("cid"))
    val lut = sub.filter($"vec_id" < 10)
      .join(withN, Seq("m"))
      .select($"vec_id".as("qid"), $"m", $"cid", d2.as("qd2"))
    (codes, lut)
  }

  def pqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pqAdcTop3(s, dir).select($"qid", $"vec_id", $"d2_adc", $"rn")
      .orderBy($"qid", $"rn")
  }

  /** PQ DISTORTION audit: per subspace, the total and mean quantization
    * error (exact int64 squared L2 between each subvector and its
    * assigned centroid) — the number that says whether the codebook is
    * adequate BEFORE recall is measured (a subspace with outsized
    * distortion is where M/nbits tuning pays; [[pqRecall]] then confirms
    * the retrieval effect). Assigned error is min-over-centroids by
    * definition, so this reads straight off the assignment join.
    *
    * Scale: the same one broadcast-codebook join as the encoder — the
    * corpus is touched once; output is M rows.
    */
  def pqDistortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = pqSub(qEmb(s, dir)).pin(true)
    val withN = broadcast(pqCodebook(sub).withColumn("cn2", norm2($"cq")))
    sub.join(withN, Seq("m"))
      .withColumn("d2", $"sn2" - lit(2L) * dot($"sq", $"cq") + $"cn2")
      .groupBy($"vec_id", $"m").agg(min($"d2").as("d2"))
      .groupBy($"m")
      .agg(count(lit(1)).as("n_vecs"), sum($"d2").as("total_d2"))
      .select($"m".cast("long").as("m"), $"n_vecs", $"total_d2",
        floor($"total_d2" / $"n_vecs").cast("long").as("mean_d2"))
      .orderBy($"m")
  }

  lazy val pqDistortionSql: String = qvecCte + pqCtes +
    s""",
       |pdist AS (
       |  SELECT cd.vec_id, cd.m,
       |    min(sn.sn2 - 2 * cd.d + cn.cn2)::BIGINT AS d2
       |  FROM pcd$kmeansIters cd
       |  JOIN psubn sn ON cd.vec_id = sn.vec_id AND cd.m = sn.m
       |  JOIN pcn$kmeansIters cn ON cd.m = cn.m AND cd.cid = cn.cid
       |  GROUP BY 1, 2)
       |SELECT m::BIGINT AS m, count(*)::BIGINT AS n_vecs,
       |  sum(d2)::BIGINT AS total_d2,
       |  (sum(d2) // count(*))::BIGINT AS mean_d2
       |FROM pdist GROUP BY m ORDER BY m""".stripMargin

  /** SQL mirror of the PQ fit + encode: subvector slices, the keyed
    * (m, cid) k-means (pcn/pcd/pa per iteration, ps/pk/pcent mean
    * requantization), ending in codes pa`kmeansIters` with psubn and the
    * final-iteration pcn/pcd kept for LUT reuse.
    */
  private def pqCtes: String = {
    val sb = new StringBuilder
    sb ++=
      s""",
         |sub AS (
         |  SELECT vec_id, m,
         |    q[m * $pqDims + 1 : m * $pqDims + $pqDims] AS sq
         |  FROM qv CROSS JOIN (SELECT unnest(range(0, $pqM)) AS m) ms),
         |psubn AS (
         |  SELECT vec_id, m, sum(y * y)::BIGINT AS sn2
         |  FROM (SELECT vec_id, m, unnest(sq) AS y FROM sub) GROUP BY 1, 2),
         |pcent0 AS (
         |  SELECT m, vec_id AS cid, sq AS cq FROM sub WHERE vec_id < $pqK)""".stripMargin
    for (t <- 0 to kmeansIters) {
      sb ++=
        s""",
           |pcn$t AS (
           |  SELECT m, cid, sum(y * y)::BIGINT AS cn2
           |  FROM (SELECT m, cid, unnest(cq) AS y FROM pcent$t) GROUP BY 1, 2),
           |pcd$t AS (
           |  SELECT vec_id, m, cid, sum(x * y)::BIGINT AS d FROM (
           |    SELECT s.vec_id, s.m, c.cid, unnest(s.sq) AS x, unnest(c.cq) AS y
           |    FROM sub s JOIN pcent$t c ON s.m = c.m) z
           |  GROUP BY 1, 2, 3),
           |pa$t AS (
           |  SELECT cd.vec_id, cd.m,
           |    (min((sn.sn2 - 2 * cd.d + cn.cn2) * $pqK + cd.cid) % $pqK)::BIGINT
           |      AS cid
           |  FROM pcd$t cd
           |  JOIN psubn sn ON cd.vec_id = sn.vec_id AND cd.m = sn.m
           |  JOIN pcn$t cn ON cd.m = cn.m AND cd.cid = cn.cid
           |  GROUP BY 1, 2)""".stripMargin
      if (t < kmeansIters) {
        sb ++=
          s""",
             |ps${t + 1} AS (
             |  SELECT a.m, a.cid, u.i, sum(u.e)::BIGINT AS sv,
             |    count(*)::BIGINT AS cnt
             |  FROM pa$t a JOIN (
             |    SELECT vec_id, m, unnest(sq) AS e,
             |           generate_subscripts(sq, 1) - 1 AS i FROM sub) u
             |    ON a.vec_id = u.vec_id AND a.m = u.m
             |  GROUP BY 1, 2, 3),
             |pk${t + 1} AS (
             |  SELECT m, cid, list(floor(sv::DOUBLE / cnt)::BIGINT ORDER BY i) AS cq
             |  FROM ps${t + 1} GROUP BY 1, 2),
             |pcent${t + 1} AS (
             |  SELECT p.m, p.cid, coalesce(c.cq, p.cq) AS cq
             |  FROM pcent$t p LEFT JOIN pk${t + 1} c
             |    ON p.m = c.m AND p.cid = c.cid)""".stripMargin
      }
    }
    sb.toString
  }

  /** LUT + ADC scoring CTEs shared by the topk and recall oracles. */
  private def pqAdcCtes: String =
    s""",
       |lut AS (
       |  SELECT cd.vec_id AS qid, cd.m, cd.cid,
       |    (sn.sn2 - 2 * cd.d + cn.cn2)::BIGINT AS qd2
       |  FROM pcd$kmeansIters cd
       |  JOIN psubn sn ON cd.vec_id = sn.vec_id AND cd.m = sn.m
       |  JOIN pcn$kmeansIters cn ON cd.m = cn.m AND cd.cid = cn.cid
       |  WHERE cd.vec_id < 10),
       |adc AS (
       |  SELECT l.qid, c.vec_id, sum(l.qd2)::BIGINT AS d2_adc
       |  FROM pa$kmeansIters c JOIN lut l ON c.m = l.m AND c.cid = l.cid
       |  WHERE c.vec_id <> l.qid
       |  GROUP BY 1, 2)""".stripMargin

  val pqTopKSql: String = qvecCte + pqCtes + pqAdcCtes +
    """
      |SELECT qid, vec_id, d2_adc, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY d2_adc, vec_id) AS rn FROM adc) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** PQ self-evaluation, mirroring [[lshRecall]]/[[ivfRecall]]: recall@3 of
    * the ADC top-3 against the EXACT integer L2 top-3 (the metric ADC
    * approximates — not cosine, so the comparison isolates quantization
    * loss from metric mismatch). Integer-only output: hits over counts.
    */
  def pqRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("d2", $"n2" - lit(2L) * dot($"q", $"qq") + $"qn2")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id")
    val approx = pqAdcTop3(s, dir)
      .select($"qid".as("aqid"), $"vec_id".as("avid"))
    exact.join(approx, $"qid" === $"aqid" && $"vec_id" === $"avid", "left")
      .groupBy($"qid")
      .agg(count(lit(1)).as("n_exact"), count($"avid").as("n_hit"))
      .orderBy($"qid")
  }

  val pqRecallSql: String = qvecCte + pqCtes + pqAdcCtes +
    """,
      |atop AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |      ORDER BY d2_adc, vec_id) AS rn FROM adc) t
      |  WHERE rn <= 3),
      |edots AS (
      |  SELECT qid, vec_id, sum(x * y)::BIGINT AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id, unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |exact3 AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT d.qid, d.vec_id, row_number() OVER (PARTITION BY d.qid
      |      ORDER BY ne.n2 - 2 * d.d + nq.n2, d.vec_id) AS rn
      |    FROM edots d JOIN nrm nq ON d.qid = nq.vec_id
      |                 JOIN nrm ne ON d.vec_id = ne.vec_id) t
      |  WHERE rn <= 3)
      |SELECT e.qid, count(*)::BIGINT AS n_exact, count(a.vec_id)::BIGINT AS n_hit
      |FROM exact3 e LEFT JOIN atop a ON e.qid = a.qid AND e.vec_id = a.vec_id
      |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** IVF-PQ composed probe — the production billion-scale ANN architecture
    * (Jégou et al. TPAMI 2011 §V; the FAISS `IVFPQ` index): the coarse IVF
    * quantizer prunes the corpus to the query's cell, and the survivors are
    * scored by PQ/ADC lookup instead of exact arithmetic. The two layers
    * solve different scale problems and compose: IVF bounds how much of the
    * corpus a probe TOUCHES (nprobe/nCells of it), PQ bounds what a touched
    * vector COSTS (M one-byte codes + M LUT adds, no raw vector read). At
    * 100 TB the serving state is the code table (4 bytes/vector) plus cell
    * assignments, both zone-mapped by cell via [[saveIvfIndex]]'s layout;
    * the scoring join is broadcast-LUT + map-side-combinable sum, and the
    * cell equality lands INSIDE the join so pruning happens before any ADC
    * work, not after.
    *
    * Output mirrors [[pqTopK]] (qid, vec_id, d2_adc, rn) restricted to the
    * query's cell — rank-3 within cell, deterministic (d2_adc, vec_id)
    * tie-break.
    */
  def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val assign = ivfAssignOf(emb, ivfCentroids(s, emb)).pin(true)
    val (codes, lut) = pqCodesAndLut(s, dir)
    val cellCodes = codes.join(assign, Seq("vec_id"))
    val cellLut = lut.join(
      assign.select($"vec_id".as("qid"), $"centroid".as("qc")), Seq("qid"))
    cellCodes.join(broadcast(cellLut), Seq("m", "cid"))
      .filter($"centroid" === $"qc" && $"vec_id" =!= $"qid")
      .groupBy($"qid", $"vec_id")
      .agg(sum($"qd2").as("d2_adc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2_adc", $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"d2_adc", $"rn")
      .orderBy($"qid", $"rn")
  }

  /** Oracle: the flat ADC scores joined to the IVF assignment on both ends
    * and filtered to same-cell pairs before ranking — post-filtering the
    * complete ADC table is value-identical to pre-filtering the candidate
    * stream (the ADC distance does not depend on the cell), so the oracle
    * stays a direct composition of the two already-proven CTE sets.
    */
  val ivfPqTopKSql: String = qvecCte + kmeansCtes + pqCtes + pqAdcCtes +
    s""",
       |assign AS (SELECT vec_id, cid AS centroid FROM a$kmeansIters),
       |cadc AS (
       |  SELECT a.qid, a.vec_id, a.d2_adc
       |  FROM adc a JOIN assign ea ON a.vec_id = ea.vec_id
       |             JOIN assign qa ON a.qid = qa.vec_id
       |  WHERE ea.centroid = qa.centroid)
       |SELECT qid, vec_id, d2_adc, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY d2_adc, vec_id) AS rn FROM cadc) t
       |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * near-duplicate grouping SCOPED TO IVF cells. The published recipe:
    * coarse-cluster the embeddings (k-means), compare pairs only WITHIN a
    * cluster (the approximation that makes semantic dedup tractable —
    * candidate volume is Σ cell² instead of N²), group by cosine ≥ θ, and
    * keep ONE member per duplicate group — the member FARTHEST from its
    * cluster centroid (the paper's keep rule: boundary examples carry more
    * signal than redundant near-centroid ones).
    *
    * Implementation rides the existing integer-exact machinery: the seeded
    * k-means fit ([[ivfCentroids]]), exact int64 distances/dots, duplicate
    * groups via large-star/small-star contraction over the within-cell
    * pair graph, keep-selection as one per-group window (d2 DESC,
    * vec_id ASC — deterministic cross-engine).
    *
    * Scale shape: the pair join shuffles on cell id, so compare volume is
    * bounded by the largest cell (nCells ≈ √N at real scale keeps cells
    * ~√N); no all-pairs join, no broadcast that grows with the corpus.
    * Output: one row per vector — (vec_id, cell, grp, is_kept); dropping
    * `is_kept = 0` rows IS the dedup action.
    */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, nCells = 8)

  /** [[semanticDedup]] with the cell count as a parameter: the gate query
    * pins 8 (mirrored by the oracle SQL); a real deployment sizes
    * nCells ≈ √N so per-cell compare volume stays ~N — ScalingBench
    * measures exactly that configuration at 10×.
    */
  def semanticDedup(s: SparkSession, dir: String, nCells: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val cents = ivfCentroids(s, emb, nCells) // checkpointed centroid table
    // the assignment frame IS the IVF index (what saveIvfIndex persists);
    // materialize it once for its four consumers (keep-rule distances,
    // both pair sides, the final cell column) instead of re-running the
    // centroid cross join per plan branch
    val withCell = emb
      .join(ivfAssignOf(emb, cents, nCells), Seq("vec_id"))
      .pin(true)
    // distance to the OWN cell centroid — the keep-rule score
    val selfD2 = withCell
      .join(broadcast(cents.withColumn("cn2", norm2($"cq"))),
        $"centroid" === $"cid")
      .select($"vec_id",
        ($"n2" - lit(2L) * dot($"q", $"cq") + $"cn2").as("d2"))
    val l = withCell.select($"centroid", $"vec_id".as("a"), $"q".as("qa"),
      $"n2".as("na"))
    val r = withCell.select($"centroid", $"vec_id".as("b"), $"q".as("qb"),
      $"n2".as("nb"))
    val pairs = l.join(r, Seq("centroid")).filter($"a" < $"b")
      .withColumn("cos", round(dot($"qa", $"qb").cast("double")
        / (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))), 4))
      .filter($"cos" >= 0.45)
      .select($"a", $"b")
    val (labels, _) = TextOps.starContraction(emb.select($"vec_id"), pairs)
    labels.select($"vec_id", $"label".as("grp"))
      .join(withCell.select($"vec_id", $"centroid"), Seq("vec_id"))
      .join(selfD2, Seq("vec_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"grp").orderBy($"d2".desc, $"vec_id")))
      .select($"vec_id", $"centroid".as("cell"), $"grp",
        ($"rn" === 1).cast("int").as("is_kept"))
      .orderBy($"vec_id")
  }

  val semanticDedupSql: String =
    qvecCte.replaceFirst("WITH ", "WITH RECURSIVE ") + kmeansCtes +
      s""",
         |cells AS (SELECT vec_id, cid FROM a$kmeansIters),
         |cn2f AS (
         |  SELECT cid, sum(y * y)::BIGINT AS cn2
         |  FROM (SELECT cid, unnest(cq) AS y FROM cent$kmeansIters)
         |  GROUP BY cid),
         |sdot AS (
         |  SELECT vec_id, sum(x * y)::BIGINT AS d FROM (
         |    SELECT e.vec_id, unnest(e.q) AS x, unnest(c.cq) AS y
         |    FROM qv e JOIN cells s ON e.vec_id = s.vec_id
         |              JOIN cent$kmeansIters c ON s.cid = c.cid) z
         |  GROUP BY vec_id),
         |selfd AS (
         |  SELECT s.vec_id, n.n2 - 2 * sd.d + cn.cn2 AS d2
         |  FROM cells s JOIN sdot sd ON s.vec_id = sd.vec_id
         |    JOIN nrm n ON s.vec_id = n.vec_id
         |    JOIN cn2f cn ON s.cid = cn.cid),
         |pd AS (
         |  SELECT a, b, sum(x * y) AS d FROM (
         |    SELECT a.vec_id AS a, b.vec_id AS b,
         |           unnest(a.q) AS x, unnest(b.q) AS y
         |    FROM (SELECT qv.*, c.cid FROM qv JOIN cells c USING (vec_id)) a
         |    JOIN (SELECT qv.*, c.cid FROM qv JOIN cells c USING (vec_id)) b
         |      ON a.cid = b.cid AND a.vec_id < b.vec_id) z
         |  GROUP BY 1, 2),
         |cpairs AS (
         |  SELECT a, b FROM pd
         |  JOIN nrm na ON a = na.vec_id JOIN nrm nb ON b = nb.vec_id
         |  WHERE round(d / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.45),
         |edges AS (SELECT a, b FROM cpairs UNION ALL SELECT b, a FROM cpairs),
         |reach(node, m) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
         |grp AS (SELECT node AS vec_id, min(m)::BIGINT AS grp
         |        FROM reach GROUP BY node)
         |SELECT g.vec_id, s.cid AS cell, g.grp,
         |  CASE WHEN row_number() OVER (PARTITION BY g.grp
         |    ORDER BY d.d2 DESC, g.vec_id) = 1 THEN 1 ELSE 0 END AS is_kept
         |FROM grp g JOIN cells s ON g.vec_id = s.vec_id
         |           JOIN selfd d ON g.vec_id = d.vec_id
         |ORDER BY g.vec_id""".stripMargin

  /** Maximum-inner-product top-5 per query vector — the recommender /
    * retrieval scoring order (user·item), which differs from cosine when
    * norms vary: a long vector can win on raw inner product while losing
    * on angle. Scores are exact int64 dot products (no normalization, no
    * floats anywhere — the one similarity query with a fully integer
    * result surface). Same broadcast-scan shape as [[cosineTopK]]: the
    * query set rides a broadcast, the corpus streams through one narrow
    * stage into a per-query top-k. The indexable path at scale is the
    * standard norm-augmentation reduction (append √(maxN²−‖x‖²) to each
    * corpus vector, 0 to queries — MIPS order becomes cosine order) on
    * top of the existing IVF/LSH machinery; this query is the exact
    * baseline any such index is judged against.
    */
  def mipsTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"))
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("dp", dot($"q", $"qq"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"dp".desc, $"vec_id")))
      .filter($"rn" <= 5)
      .select($"qid", $"vec_id", $"dp", $"rn")
      .orderBy($"qid", $"rn")
  }

  val mipsTopKSql: String = qvecCte +
    """, dots AS (
      |  SELECT qid, vec_id, sum(x * y)::BIGINT AS dp FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2)
      |SELECT qid, vec_id, dp, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY dp DESC, vec_id) AS rn FROM dots) t
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** k-NN GRAPH over the whole corpus: every vector's top-3 exact-cosine
    * neighbors among its LSH-bucket mates. This is the graph that feeds
    * graph-based curation (SemDeDup variants, diversity sampling, label
    * propagation) — [[lshTopK]] probes a fixed 10-query set; this builds
    * the all-nodes neighbor list in one pass.
    *
    * Scale shape: one equi-self-join on the `nPlanes`-bit LSH bucket
    * (candidate volume ∝ Σ bucket², the standard LSH trade), then a
    * per-node top-3 window on the bucket-partitioned shuffle. `nPlanes`
    * is the scale knob, exactly like IVF's nCells: bucket count 2^planes
    * should track N (planes ≈ log₂N − log₂(target bucket size)), keeping
    * per-bucket compare volume — and hence total work — linear in N; the
    * gate pins the 8-plane geometry, ScalingBench measures the scaled
    * ones. Vectors whose bucket holds no other member emit no rows
    * (isolated in the graph), which downstream consumers must treat as
    * "no neighbors found", not "no similar vectors exist".
    */
  def knnGraph(s: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val withB = qEmb(s, dir).join(lshBucketsRaw(s, dir, nPlanes), Seq("vec_id"))
    val l = withB.select($"bucket", $"vec_id", $"q", $"n2")
    val r = withB.select($"bucket", $"vec_id".as("nbr"), $"q".as("qn"),
      $"n2".as("nn"))
    l.join(r, Seq("bucket")).filter($"vec_id" =!= $"nbr")
      .withColumn("cos", round(dot($"q", $"qn").cast("double")
        / (sqrt($"n2".cast("double")) * sqrt($"nn".cast("double"))), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cos".desc, $"nbr")))
      .filter($"rn" <= 3)
      .select($"vec_id", $"nbr", $"cos", $"rn")
      .orderBy($"vec_id", $"rn")
  }

  val knnGraphSql: String = qvecCte +
    """, comp AS (
      |  SELECT vec_id, unnest(q) AS e, generate_subscripts(q, 1) - 1 AS i
      |  FROM qv),
      |hp AS (
      |  SELECT j, i, ((1 + (j * 64 + i) * 2654435761) % 1999) - 999 AS h
      |  FROM range(8) t(j), range(64) s(i)),
      |hdots AS (
      |  SELECT vec_id, j, sum(e * h) AS d
      |  FROM comp JOIN hp USING (i) GROUP BY 1, 2),
      |buckets AS (
      |  SELECT vec_id, sum(CASE WHEN d >= 0 THEN (2^j)::BIGINT ELSE 0 END) AS bucket
      |  FROM hdots GROUP BY vec_id),
      |dots AS (
      |  SELECT vid, nbr, sum(x * y) AS d FROM (
      |    SELECT l.vec_id AS vid, e.vec_id AS nbr,
      |           unnest(l.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT qv.vec_id, qv.q, b.bucket FROM qv
      |          JOIN buckets b ON qv.vec_id = b.vec_id) l
      |    JOIN (SELECT qv.vec_id, qv.q, b.bucket FROM qv
      |          JOIN buckets b ON qv.vec_id = b.vec_id) e
      |      ON l.bucket = e.bucket AND e.vec_id <> l.vec_id) z
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT vid, nbr,
      |    round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |  FROM dots d JOIN nrm nq ON d.vid = nq.vec_id
      |              JOIN nrm ne ON d.nbr = ne.vec_id)
      |SELECT vid AS vec_id, nbr, cos, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vid
      |    ORDER BY cos DESC, nbr) AS rn FROM scored) t
      |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin

  /** Semi-supervised label propagation over the k-NN graph (Zhu &
    * Ghahramani 2002, CMU-CALD-02-107): the 100-vector eval set starts
    * UNLABELED, the rest of the corpus is clamped to its true label, and
    * for 3 synchronous rounds every unlabeled vector takes the majority
    * label of its 3 nearest neighbors' current labels (labeled-neighbor
    * votes only; ties to the smaller label; no labeled neighbor → keep).
    * Reported as the true×predicted confusion of the eval set, -1 =
    * still unlabeled — the graph-side transductive complement to
    * [[knnClassify]]'s direct vote (propagation reaches through chains
    * of unlabeled vectors that a one-hop vote cannot).
    *
    * Scale: the graph build is [[knnGraph]]'s bucketed form (never
    * all-pairs); each round is one edge-keyed join + one vec-keyed
    * majority window over a ≤3|V|-row vote frame, with the label state
    * checkpointed per round (the iterative-state law — reference the
    * predecessor once, keep lineage flat). Rounds are a fixed constant:
    * diffusion depth is configuration, not data.
    */
  def labelProp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = knnGraph(s, dir).select($"vec_id", $"nbr").pin(true)
    var lab = Tables.embeddings(s, dir)
      .select($"vec_id", $"label".cast("long").as("true_label"),
        when($"vec_id" >= 100, $"label".cast("long")).as("cur"))
      .pin(true)
    for (_ <- 1 to 3) {
      val maj = edges
        .join(lab.select($"vec_id".as("nbr"), $"cur".as("nl")), Seq("nbr"))
        .filter($"nl".isNotNull)
        .groupBy($"vec_id", $"nl").agg(count(lit(1)).as("v"))
        .withColumn("r", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"v".desc, $"nl")))
        .filter($"r" === 1)
        .select($"vec_id", $"nl")
      lab = lab.join(maj, Seq("vec_id"), "left")
        .select($"vec_id", $"true_label",
          when($"vec_id" >= 100, $"cur")
            .otherwise(coalesce($"nl", $"cur")).as("cur"))
        .pin(true)
    }
    lab.filter($"vec_id" < 100)
      .groupBy($"true_label", coalesce($"cur", lit(-1L)).as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"true_label", $"pred_label")
  }

  val labelPropSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""votes$i AS (
         |  SELECT e.vec_id, l.cur AS nl, count(*) AS v
         |  FROM edges e JOIN lab${i - 1} l ON e.nbr = l.vec_id
         |  WHERE l.cur IS NOT NULL GROUP BY 1, 2),
         |maj$i AS (
         |  SELECT vec_id, nl FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY v DESC, nl) AS rn FROM votes$i) t
         |  WHERE rn = 1),
         |lab$i AS (
         |  SELECT l.vec_id, l.true_label,
         |    CASE WHEN l.vec_id >= 100 THEN l.cur
         |         ELSE coalesce(m.nl, l.cur) END AS cur
         |  FROM lab${i - 1} l LEFT JOIN maj$i m USING (vec_id))"""
        .stripMargin
    }.mkString(",\n")
    knnGraphSql
      .replace("SELECT vid AS vec_id, nbr, cos, rn FROM (",
        ", knn AS (SELECT vid AS vec_id, nbr, cos, rn FROM (")
      .replace("WHERE rn <= 3 ORDER BY vec_id, rn",
        "WHERE rn <= 3)") +
      s""",
         |edges AS (SELECT vec_id, nbr FROM knn),
         |lab0 AS (
         |  SELECT vec_id, label::BIGINT AS true_label,
         |    CASE WHEN vec_id >= 100 THEN label::BIGINT END AS cur
         |  FROM embeddings),
         |$rounds
         |SELECT true_label, coalesce(cur, -1)::BIGINT AS pred_label,
         |  count(*)::BIGINT AS n
         |FROM lab3 WHERE vec_id < 100
         |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin
  }

  /** Matryoshka-style truncation evaluation (Kusupati et al. 2022,
    * arXiv:2205.13147): recall@3 of exact cosine retrieval using only the
    * FIRST 16 of 64 dimensions against the full-width exact top-3. This
    * is the question a 100 TB index answers before committing to a
    * truncated (4× cheaper) index: how much ranking quality do the prefix
    * dims carry? Both rankings are integer-exact (same quantized grid,
    * prefix norms recomputed over the slice), so the recall numbers are
    * bit-reproducible — a property float ANN evals never have.
    *
    * Shape: two broadcast-scan top-k passes (full + prefix) over the same
    * corpus scan shape as [[cosineTopK]], joined per query — at scale the
    * prefix pass is the one you'd back with an IVF index, which is why
    * the truncation question is measured at the EXACT tier first.
    */
  def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def top3(emb: DataFrame): DataFrame = {
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
      emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"qid")
        .withColumn("cos", round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
        .filter($"rn" <= 3)
        .select($"qid", $"vec_id")
    }
    val emb = qEmb(s, dir).pin(true) // full + prefix passes
    val full = top3(emb)
    val prefix = top3(emb.select($"vec_id", slice($"q", 1, 16).as("q"))
      .withColumn("n2", norm2($"q")))
    // one consumer of `full` (a second reference would re-plan its
    // broadcast pass): left-join marks hits, the per-qid count keeps
    // zero-recall queries because every qid has its 3 full-width rows
    full.join(prefix.withColumn("hit", lit(1L)), Seq("qid", "vec_id"), "left")
      .groupBy($"qid").agg(sum(coalesce($"hit", lit(0L))).as("n_hits"))
      .withColumn("recall_permille",
        floor($"n_hits" * 1000L / 3L).cast("long"))
      .orderBy($"qid")
  }

  val matryoshkaRecallSql: String = qvecCte +
    """, qp AS (SELECT vec_id, q[1:16] AS q FROM qv),
      |np AS (
      |  SELECT vec_id, sum(e * e)::BIGINT AS n2
      |  FROM (SELECT vec_id, unnest(q) AS e FROM qp) GROUP BY vec_id),
      |fd AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |ft AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, fd.vec_id, row_number() OVER (PARTITION BY qid
      |      ORDER BY round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC,
      |               fd.vec_id) AS rn
      |    FROM fd JOIN nrm nq ON fd.qid = nq.vec_id
      |            JOIN nrm ne ON fd.vec_id = ne.vec_id) t
      |  WHERE rn <= 3),
      |pd AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qp WHERE vec_id < 10) q
      |    JOIN qp e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |pt AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, pd.vec_id, row_number() OVER (PARTITION BY qid
      |      ORDER BY round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC,
      |               pd.vec_id) AS rn
      |    FROM pd JOIN np nq ON pd.qid = nq.vec_id
      |            JOIN np ne ON pd.vec_id = ne.vec_id) t
      |  WHERE rn <= 3),
      |hits AS (
      |  SELECT ft.qid, count(*)::BIGINT AS n_hits
      |  FROM ft JOIN pt ON ft.qid = pt.qid AND ft.vec_id = pt.vec_id
      |  GROUP BY ft.qid)
      |SELECT q.qid, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
      |  ((coalesce(h.n_hits, 0) * 1000) // 3)::BIGINT AS recall_permille
      |FROM (SELECT DISTINCT qid FROM ft) q
      |LEFT JOIN hits h ON q.qid = h.qid
      |ORDER BY q.qid""".stripMargin

  /** Diversity (coreset) selection: k-center greedy / farthest-point
    * traversal (Gonzalez 1985, the 2-approximation to the k-center
    * problem) — start from vec 0, then repeatedly pick the vector
    * FARTHEST from the chosen set (exact int64 squared L2, smallest-id
    * tie-break). This is the curation complement of [[semanticDedup]]:
    * dedup removes redundancy that's already there, diversity selection
    * builds a small set that COVERS the space (each step's sel_d2 is the
    * current covering radius — monotonically non-increasing, which the
    * spec asserts). Used for coreset/eval-set picking in data pipelines.
    *
    * Shape: k−1 rounds of (broadcast ≤k-row chosen set → per-vector min
    * distance → 1-row TakeOrdered winner), each round checkpointed so the
    * winner never touches the driver and the final plan is flat. The
    * sequential k dependence is inherent to the greedy algorithm —
    * parallelism lives inside each round's corpus pass, which is the part
    * that grows with data. For large k at 100 TB the standard move is
    * k-means++-style sampled initialization on top of the same kernel.
    */
  def diversitySample(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    diversitySampleOf(qEmb(s, dir), k)

  /** Kernel over an arbitrary (vec_id, q, n2) frame — split out so the
    * duplicate-corpus degenerate case (covering radius 0) is testable
    * without a fixture table. Seeded at vec_id 0 (Gonzalez's seed is
    * arbitrary). When the distinct-vector pool is exhausted before k
    * (every remaining vector duplicates a chosen one), the anti-join
    * leaves an empty candidate frame and the traversal stops short —
    * fewer-but-distinct centers, never a duplicated one.
    */
  private[operators] def diversitySampleOf(embQ: DataFrame, k: Int): DataFrame = {
    val s = embQ.sparkSession
    import s.implicits._
    val emb = embQ.pin(true) // re-scanned every round
    var chosen = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("cid"), $"q".as("cq"), $"n2".as("cn2"),
        lit(0).as("sel_order"), lit(0L).as("sel_d2"))
      .pin(true)
    for (i <- 1 until k) {
      // already-chosen ids leave the candidate frame (broadcast ≤k-row
      // anti-join): without this, once the covering radius hits 0 (every
      // remaining vector duplicates a chosen one) all md2 are 0 and the
      // vec_id tie-break would re-select vec 0 forever — k distinct
      // centers is the operator's contract, so duplicates must lose by
      // construction, not by tie-break luck. Mirrored in the oracle CTE.
      val winner = emb
        .join(broadcast(chosen.select($"cid".as("vec_id"))),
          Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(chosen.select($"cid", $"cq", $"cn2")))
        .withColumn("d2", $"n2" - lit(2L) * dot($"q", $"cq") + $"cn2")
        .groupBy($"vec_id").agg(min($"d2").as("md2"))
        .orderBy($"md2".desc, $"vec_id")
        .limit(1)
        // covering radius 0 = every remaining vector duplicates a chosen
        // one; an empty winner frame ends the traversal (fewer-but-
        // distinct centers) with no driver-side md2 inspection
        .filter($"md2" > 0)
        .join(emb, Seq("vec_id"))
        .select($"vec_id".as("cid"), $"q".as("cq"), $"n2".as("cn2"),
          lit(i).as("sel_order"), $"md2".as("sel_d2"))
      chosen = chosen.unionByName(winner).pin(true)
    }
    chosen.select($"sel_order", $"cid".as("vec_id"), $"sel_d2")
      .orderBy($"sel_order")
  }

  val diversitySampleSql: String = {
    val sb = new StringBuilder(qvecCte)
    // ch$i is MATERIALIZED: DuckDB inlines plain CTEs per reference, and
    // each round references the previous chosen-set three times (distance
    // cross join, NOT IN anti-join, union) — inlined, that's 3^k
    // expansions of the base scan and the oracle dies on file handles
    // before it dies on time. Materialization makes the chain linear,
    // which is also what the Spark side's per-round localCheckpoint does.
    sb ++= """, ch0 AS MATERIALIZED (
             |  SELECT vec_id, q, 0 AS sel_order, 0::BIGINT AS sel_d2
             |  FROM qv WHERE vec_id = 0)""".stripMargin
    for (i <- 1 until 10) {
      val prev = s"ch${i - 1}"
      sb ++=
        s""",
           |dd$i AS (
           |  SELECT vec_id, cid, sum(x * y) AS d FROM (
           |    SELECT e.vec_id, c.vec_id AS cid,
           |           unnest(e.q) AS x, unnest(c.q) AS y
           |    FROM qv e CROSS JOIN $prev c
           |    WHERE e.vec_id NOT IN (SELECT vec_id FROM $prev)) z
           |  GROUP BY 1, 2),
           |m$i AS (
           |  SELECT dd.vec_id,
           |    min(ne.n2 - 2 * dd.d + nc.n2)::BIGINT AS md2
           |  FROM dd$i dd JOIN nrm ne ON dd.vec_id = ne.vec_id
           |               JOIN nrm nc ON dd.cid = nc.vec_id
           |  GROUP BY dd.vec_id),
           |p$i AS (SELECT vec_id, md2 FROM m$i WHERE md2 > 0
           |        ORDER BY md2 DESC, vec_id LIMIT 1),
           |ch$i AS MATERIALIZED (
           |  SELECT vec_id, q, sel_order, sel_d2 FROM $prev
           |  UNION ALL
           |  SELECT p.vec_id, qv.q, $i, p.md2
           |  FROM p$i p JOIN qv ON p.vec_id = qv.vec_id)""".stripMargin
    }
    sb ++= "\nSELECT sel_order, vec_id, sel_d2 FROM ch9 ORDER BY sel_order"
    sb.toString
  }

  /** SQ8 scalar quantization: per-vector symmetric int8 codes on the
    * fixed-point grid. scale = ceil(amax/127) (integer form
    * `floor((amax+126)/127)`, clamped ≥ 1 — same contract as
    * [[quantizeErr]]), code_i = floor(q_i/scale) ∈ [-128, 127]. The
    * serving layout a flat SQ8 index stores per vector is exactly these
    * three columns: codes (1 byte/dim — 8× smaller than the int64 grid,
    * 4× smaller than float32), one scale, one norm.
    */
  private def sq8(emb: DataFrame): DataFrame =
    emb
      .withColumn("amax", array_max(transform(col("q"), e => abs(e))))
      .withColumn("qs",
        greatest(lit(1L), floor((col("amax") + lit(126L)) / lit(127)).cast("long")))
      .withColumn("c",
        transform(col("q"), e => floor(e.cast("double") / col("qs")).cast("long")))
      .drop("amax")

  /** Shared SQ8 scoring frame: (qid, vec_id, cos_sq) for the broadcast
    * 10-query set against the whole corpus, scored on CODES ONLY:
    * dot(q,d) ≈ scale_q·scale_d·dot(c_q,c_d), normalized by the stored
    * true norms. Integer numerator (scales ~10², code dot ≤ 64·127² —
    * well inside int64), one double division → bit-identical across
    * engines, so the gate hashes scores, not just ranks.
    */
  private def sqScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = sq8(qEmb(s, dir))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"c".as("qc"), $"qs".as("qqs"), $"n2".as("qn2"))
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos_sq",
        round(($"qqs" * $"qs" * dot($"c", $"qc")).cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .select($"qid", $"vec_id", $"cos_sq")
  }

  /** SQ8 cosine top-3 per query — the flat scalar-quantized ANN probe
    * (FAISS `SQ8` family): the 100 TB trade where PQ's 4 bytes/vec is too
    * lossy but float32 doesn't fit. Scale: identical shape to
    * [[cosineTopK]] — broadcast query set, one narrow corpus pass over the
    * code column (no raw-vector read), per-query top-k; on a cluster the
    * scan side is the only big input and it's 8× smaller than the grid.
    */
  def sqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    sqScored(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos_sq".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"cos_sq", $"rn")
      .orderBy($"qid", $"rn")
  }

  private val sqCtes: String =
    """, sqv AS (
      |  SELECT vec_id,
      |    greatest(1, floor((list_max([abs(e) FOR e IN q]) + 126) / 127)::BIGINT)
      |      AS qs,
      |    q
      |  FROM qv),
      |sqc AS (
      |  SELECT vec_id, qs,
      |    [floor(e::DOUBLE / qs)::BIGINT FOR e IN q] AS c
      |  FROM sqv),
      |cdots AS (
      |  SELECT qid, vec_id, qqs, dqs, sum(x * y)::BIGINT AS cd FROM (
      |    SELECT q.vec_id AS qid, e.vec_id, q.qs AS qqs, e.qs AS dqs,
      |           unnest(q.c) AS x, unnest(e.c) AS y
      |    FROM (SELECT * FROM sqc WHERE vec_id < 10) q
      |    JOIN sqc e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2, 3, 4),
      |sqscored AS (
      |  SELECT qid, cdots.vec_id,
      |    round(qqs * dqs * cd / (sqrt(ne.n2) * sqrt(nq.n2)), 4) AS cos_sq
      |  FROM cdots JOIN nrm nq ON cdots.qid = nq.vec_id
      |             JOIN nrm ne ON cdots.vec_id = ne.vec_id)
      |""".stripMargin

  val sqTopKSql: String = qvecCte + sqCtes +
    """SELECT qid, vec_id, cos_sq, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY cos_sq DESC, vec_id) AS rn FROM sqscored) t
      |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** SQ8 recall@3 against the exact-cosine top-3 — the acceptance gate a
    * deployment runs before swapping the float store for codes (same
    * contract as [[pqRecall]]/[[lshRecall]]: n_exact / n_hit per query,
    * integer columns, no float compare).
    */
  def sqRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id")
    val approx = sqScored(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos_sq".desc, $"vec_id")))
      .filter($"rn" <= 3)
      .select($"qid".as("aqid"), $"vec_id".as("avid"))
    exact.join(approx, $"qid" === $"aqid" && $"vec_id" === $"avid", "left")
      .groupBy($"qid")
      .agg(count(lit(1)).as("n_exact"), count($"avid").as("n_hit"))
      .orderBy($"qid")
  }

  val sqRecallSql: String = qvecCte + sqCtes +
    """, atop AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
      |      ORDER BY cos_sq DESC, vec_id) AS rn FROM sqscored) t
      |  WHERE rn <= 3),
      |edots AS (
      |  SELECT qid, vec_id, sum(x * y)::BIGINT AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id, unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |exact3 AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT d.qid, d.vec_id, row_number() OVER (PARTITION BY d.qid
      |      ORDER BY round(d.d / (sqrt(ne.n2) * sqrt(nq.n2)), 4) DESC,
      |               d.vec_id) AS rn
      |    FROM edots d JOIN nrm nq ON d.qid = nq.vec_id
      |                 JOIN nrm ne ON d.vec_id = ne.vec_id) t
      |  WHERE rn <= 3)
      |SELECT e.qid, count(*)::BIGINT AS n_exact, count(a.vec_id)::BIGINT AS n_hit
      |FROM exact3 e LEFT JOIN atop a ON e.qid = a.qid AND e.vec_id = a.vec_id
      |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * diversity rerank of retrieval candidates: per query (vec_id < 5),
    * take the top-8 candidates by exact inner product, then greedily pick
    * 4 — each round the candidate maximizing
    * λ·sim(c, q) − (1−λ)·max_{s∈chosen} sim(c, s) with λ = 0.7 — so the
    * reranked list trades relevance against redundancy (the
    * RAG-context / search-results diversification step; round 1 is pure
    * relevance, the empty-set penalty term). All similarities are RAW
    * integer dot products and λ is applied as 7·rel − 3·penalty, so every
    * score is exact int64 and ranking (score desc, id) can never diverge
    * cross-engine.
    *
    * Scale: the expensive part is the candidate fetch — one broadcast-
    * query corpus pass (or any ANN probe upstream); the rerank itself
    * touches only the pool (queries × 8 rows) — pool-sized pairwise dots
    * once, then per-round joins on pool-sized frames. The sequential
    * k = 4 dependence is MMR's definition (same structure as
    * [[diversitySampleOf]]), with each round one small checkpointed DAG.
    */
  def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"q".as("qq"))
    val pool = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("dq", dot($"q", $"qq"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"dq".desc, $"vec_id")))
      .filter($"rn" <= 8)
      .select($"qid", $"vec_id".as("cid"), $"q", $"dq")
      .pin(true) // pairwise dots + every greedy round
    val ccd = pool.select($"qid", $"cid".as("c1"), $"q".as("q1"))
      .join(pool.select($"qid", $"cid".as("c2"), $"q".as("q2")), Seq("qid"))
      .filter($"c1" =!= $"c2")
      .select($"qid", $"c1", $"c2", dot($"q1", $"q2").as("d"))
      .pin(true) // re-joined every round
    var sel = pool
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"dq".desc, $"cid")))
      .filter($"rn" === 1)
      .select($"qid", $"cid", lit(1).as("sel_order"),
        (lit(7L) * $"dq").as("mmr_score"))
      .pin(true)
    for (i <- 2 to 4) {
      val win = pool
        .join(sel.select($"qid", $"cid"), Seq("qid", "cid"), "left_anti")
        .join(ccd.withColumnRenamed("c1", "cid"), Seq("qid", "cid"))
        .join(sel.select($"qid", $"cid".as("c2")), Seq("qid", "c2"))
        .groupBy($"qid", $"cid", $"dq").agg(max($"d").as("ms"))
        .select($"qid", $"cid",
          (lit(7L) * $"dq" - lit(3L) * $"ms").as("score"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"score".desc, $"cid")))
        .filter($"rn" === 1)
        .select($"qid", $"cid", lit(i).as("sel_order"),
          $"score".as("mmr_score"))
      sel = sel.unionByName(win).pin(true)
    }
    sel.select($"qid", $"sel_order", $"cid".as("vec_id"), $"mmr_score")
      .orderBy($"qid", $"sel_order")
  }

  val mmrRerankSql: String = {
    val sb = new StringBuilder(qvecCte)
    sb ++=
      """, qdots AS (
        |  SELECT qid, vec_id, sum(x * y)::BIGINT AS dq FROM (
        |    SELECT q.vec_id AS qid, e.vec_id,
        |           unnest(q.q) AS x, unnest(e.q) AS y
        |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 5) q
        |    JOIN qv e ON e.vec_id <> q.vec_id) z
        |  GROUP BY 1, 2),
        |pool AS MATERIALIZED (
        |  SELECT qid, vec_id AS cid, dq FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY dq DESC, vec_id) AS rn
        |    FROM qdots) t WHERE rn <= 8),
        |ccd AS MATERIALIZED (
        |  SELECT qid, c1, c2, sum(x * y)::BIGINT AS d FROM (
        |    SELECT a.qid, a.cid AS c1, b.cid AS c2,
        |           unnest(qa.q) AS x, unnest(qb.q) AS y
        |    FROM pool a JOIN pool b ON a.qid = b.qid AND a.cid <> b.cid
        |    JOIN qv qa ON a.cid = qa.vec_id
        |    JOIN qv qb ON b.cid = qb.vec_id) z
        |  GROUP BY 1, 2, 3),
        |s1 AS MATERIALIZED (
        |  SELECT qid, cid, 1 AS sel_order, 7 * dq AS mmr_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY dq DESC, cid) AS rn
        |    FROM pool) t WHERE rn = 1),
        |ch1 AS (SELECT qid, cid FROM s1)""".stripMargin
    for (i <- 2 to 4) {
      sb ++=
        s""",
           |cand$i AS (
           |  SELECT p.qid, p.cid, 7 * p.dq - 3 * max(c.d) AS score
           |  FROM pool p
           |  JOIN ccd c ON c.qid = p.qid AND c.c1 = p.cid
           |  JOIN ch${i - 1} s ON s.qid = c.qid AND s.cid = c.c2
           |  WHERE NOT EXISTS (SELECT 1 FROM ch${i - 1} w
           |                    WHERE w.qid = p.qid AND w.cid = p.cid)
           |  GROUP BY p.qid, p.cid, p.dq),
           |s$i AS MATERIALIZED (
           |  SELECT qid, cid, $i AS sel_order, score AS mmr_score FROM (
           |    SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY score DESC, cid) AS rn
           |    FROM cand$i) t WHERE rn = 1),
           |ch$i AS (SELECT qid, cid FROM ch${i - 1}
           |         UNION ALL SELECT qid, cid FROM s$i)""".stripMargin
    }
    sb ++=
      """
        |SELECT qid, sel_order, cid AS vec_id, mmr_score
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY qid, sel_order""".stripMargin
    sb.toString
  }

  /** Nearest-class-mean classification: every vector assigned the label of
    * its closest per-label centroid (exact integer squared-L2 over the
    * fixed-point grid, floor-mean centroids — the same prototype frame as
    * [[labelCentroids]]), reported as the true×predicted CONFUSION matrix.
    * This is the standard embedding-space sanity probe (Rocchio / nearest
    * class mean): if labels aren't recoverable from their own prototypes,
    * no downstream classifier on these embeddings will do better.
    *
    * Scale: the centroid frame is labels×dims rows (KB at any corpus
    * size) and broadcasts; the corpus is touched twice (one mergeable
    * centroid agg, one scoring pass), and the scoring join fans each
    * exploded (vec, dim) row out only |labels| ways with bounded
    * (vec × label) aggregation state. Ties break on the smaller label via
    * a lexicographic struct-min, so the argmin is deterministic
    * cross-engine.
    */
  def nearestCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ex = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        posexplode(qvec($"embedding")).as(Seq("d", "e")))
    val cent = ex.groupBy($"label".as("clabel"), $"d")
      .agg(floor(sum($"e").cast("double") / count(lit(1)))
        .cast("long").as("m"))
    ex.join(broadcast(cent), Seq("d"))
      .groupBy($"vec_id", $"label", $"clabel")
      .agg(sum(($"e" - $"m") * ($"e" - $"m")).as("dist"))
      .groupBy($"vec_id", $"label")
      .agg(min(struct($"dist", $"clabel")).as("best"))
      .select($"label".cast("long").as("true_label"),
        $"best.clabel".cast("long").as("pred_label"))
      .groupBy($"true_label", $"pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy($"true_label", $"pred_label")
  }

  val nearestCentroidSql: String =
    """WITH qv AS (
      |  SELECT vec_id, label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |ex AS (SELECT vec_id, label, unnest(q) AS e,
      |              generate_subscripts(q, 1) - 1 AS d FROM qv),
      |cent AS (SELECT label AS clabel, d,
      |    floor(sum(e)::DOUBLE / count(*))::BIGINT AS m
      |  FROM ex GROUP BY 1, 2),
      |dist AS (
      |  SELECT vec_id, label, clabel,
      |    sum((e - m) * (e - m))::BIGINT AS dist
      |  FROM ex JOIN cent USING (d) GROUP BY 1, 2, 3),
      |pred AS (
      |  SELECT vec_id, label, clabel AS pred_label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, clabel) AS rn FROM dist) t
      |  WHERE rn = 1)
      |SELECT label::BIGINT AS true_label, pred_label::BIGINT AS pred_label,
      |  count(*)::BIGINT AS n
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** k-NN majority-vote classification (Cover & Hart 1967) of a FIXED
    * 100-vector evaluation set against the rest of the corpus: each held
    * -out vector takes the majority label of its 5 nearest neighbors by
    * exact integer squared-L2 (d² = |a|² + |b|² − 2·a·b on the
    * fixed-point grid — norms precomputed, the dot via the codegen
    * [[graft.functions.ArrayOps.longDot]]), votes tie-broken by smaller
    * label; reported as the true×predicted confusion matrix. Alongside
    * [[nearestCentroid]] this is the other standard embedding-space
    * probe: NCM tests global class separation, k-NN tests local
    * structure.
    *
    * Scale: the EVAL SET is configuration (a benchmark's test split is
    * fixed-size by design, like the vec_id<10 probe convention), so the
    * broadcast side is bounded at any corpus size; the train corpus
    * streams through one codegen scoring stage and the per-query top-5
    * is a qid-keyed window. At 100 TB the exact scoring stage swaps for
    * the IVF/PQ top-k (`sim_ivf_topk` — same (qid, neighbor, label)
    * interface); the vote and matrix are unchanged.
    */
  def knnClassify(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"label".cast("long").as("label"),
        qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val test = emb.filter($"vec_id" < 100)
      .select($"vec_id".as("qid"), $"label".as("true_label"),
        $"q".as("qq"), $"n2".as("qn2"))
    val train = emb.filter($"vec_id" >= 100)
    train.crossJoin(broadcast(test))
      .select($"qid", $"true_label", $"vec_id", $"label",
        ($"n2" + $"qn2" - lit(2L) * dot($"q", $"qq")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"vec_id")))
      .filter($"rn" <= 5)
      .groupBy($"qid", $"true_label", $"label")
      .agg(count(lit(1)).as("v"))
      .withColumn("vr", row_number().over(
        Window.partitionBy($"qid").orderBy($"v".desc, $"label")))
      .filter($"vr" === 1)
      .groupBy($"true_label", $"label".as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"true_label", $"pred_label")
  }

  val knnClassifySql: String =
    """WITH qv AS (
      |  SELECT vec_id, label::BIGINT AS label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |tr AS (SELECT * FROM qv WHERE vec_id >= 100),
      |te AS (SELECT vec_id AS qid, label AS true_label, q AS qq
      |       FROM qv WHERE vec_id < 100),
      |d AS (
      |  SELECT qid, true_label, vec_id, label,
      |    sum((x - y) * (x - y))::BIGINT AS d2
      |  FROM (SELECT te.qid, te.true_label, tr.vec_id, tr.label,
      |          unnest(tr.q) AS x, unnest(te.qq) AS y
      |        FROM tr, te) z
      |  GROUP BY 1, 2, 3, 4),
      |nn AS (
      |  SELECT qid, true_label, label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid
      |      ORDER BY d2, vec_id) AS rn FROM d) t
      |  WHERE rn <= 5),
      |votes AS (
      |  SELECT qid, true_label, label, count(*) AS v
      |  FROM nn GROUP BY 1, 2, 3),
      |pred AS (
      |  SELECT qid, true_label, label AS pred_label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid
      |      ORDER BY v DESC, label) AS rn FROM votes) t
      |  WHERE rn = 1)
      |SELECT true_label, pred_label, count(*)::BIGINT AS n
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** nDCG@10 of the exact k-NN retrieval under label relevance — the
    * ranking-quality metric that completes the eval battery (AUC and
    * PR measure the CLASSIFIER; nDCG measures the RANKING a retrieval
    * system actually serves). For each of the 10 fixed query vectors,
    * the corpus is ranked by exact quantized L2 (the [[knnClassify]]
    * retrieval), a position is relevant iff its label matches the
    * query's, and DCG uses the HARMONIC discount 1/(i+1) — Järvelin &
    * Kekäläinen's framework explicitly admits alternative discount
    * curves, and the harmonic one is exactly representable in integers:
    * scaling by lcm(2..11) = 27720 makes every positional weight
    * 27720/(i+1) a whole number, so DCG, ideal DCG (the top-min(10,R)
    * prefix for a query whose label has R corpus members), and the
    * permille ratio are all exact across engines — a log2 discount
    * would park an irrational in every weight.
    *
    * Scale: the ranking is the bounded-broadcast probe scan (10 query
    * vectors against the corpus — the sim_cosine_topk shape) ended by a
    * qid-PARTITIONED top-10 window; the per-label relevant counts are
    * one keyed aggregation. Nothing holds more than 10 rows per query
    * past the scan.
    */
  /** The exact top-10 retrieval frame under label relevance — (qid,
    * true_label, vec_id, label, rn), rn 1..10 by quantized L2 with
    * vec_id ties — shared by [[evalNdcg]] and [[evalRankBattery]]; the
    * per-label corpus counts ride along for the ideal-ranking
    * denominators.
    */
  private def rankedTopOf(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"label".cast("long").as("label"),
        qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val qs = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"label".as("true_label"),
        $"q".as("qq"), $"n2".as("qn2"))
    val corpus = emb.filter($"vec_id" >= 10)
    val nLabel = corpus.groupBy($"label".as("true_label"))
      .agg(count(lit(1)).as("n_label"))
    val top = corpus.crossJoin(broadcast(qs))
      .select($"qid", $"true_label", $"vec_id", $"label",
        ($"n2" + $"qn2" - lit(2L) * dot($"q", $"qq")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"d2", $"vec_id")))
      .filter($"rn" <= 10)
    (top, nLabel)
  }

  def evalNdcg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wts = Seq(13860L, 9240L, 6930L, 5544L, 4620L,
      3960L, 3465L, 3080L, 2772L, 2520L)
    val cum = wts.scanLeft(0L)(_ + _).tail
    val (top, nLabel) = rankedTopOf(s, dir)
    top
      .groupBy($"qid", $"true_label")
      .agg(sum(when($"label" === $"true_label",
          element_at(array(wts.map(lit): _*), $"rn".cast("int")))
          .otherwise(0L)).as("dcg"),
        sum(when($"label" === $"true_label", 1L).otherwise(0L))
          .as("n_rel"))
      .join(nLabel, Seq("true_label"))
      .withColumn("idcg", element_at(array(cum.map(lit): _*),
        least(lit(10L), $"n_label").cast("int")))
      .select($"qid", $"true_label", $"n_rel", $"dcg", $"idcg",
        expr("(1000 * dcg) div idcg").as("ndcg_pm"))
      .orderBy($"qid")
  }

  val evalNdcgSql: String =
    """WITH qv AS (
      |  SELECT vec_id, label::BIGINT AS label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |co AS (SELECT * FROM qv WHERE vec_id >= 10),
      |qs AS (SELECT vec_id AS qid, label AS true_label, q AS qq
      |       FROM qv WHERE vec_id < 10),
      |nl AS (SELECT label AS true_label, count(*)::BIGINT AS n_label
      |       FROM co GROUP BY 1),
      |d AS (
      |  SELECT qid, true_label, vec_id, label,
      |    sum((x - y) * (x - y))::BIGINT AS d2
      |  FROM (SELECT qs.qid, qs.true_label, co.vec_id, co.label,
      |          unnest(co.q) AS x, unnest(qs.qq) AS y
      |        FROM co, qs) z
      |  GROUP BY 1, 2, 3, 4),
      |top AS (
      |  SELECT qid, true_label, label, rn FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid
      |      ORDER BY d2, vec_id) AS rn FROM d) t
      |  WHERE rn <= 10),
      |g AS (
      |  SELECT qid, true_label,
      |    sum(CASE WHEN label = true_label THEN
      |      ([13860,9240,6930,5544,4620,3960,3465,3080,2772,2520])[rn]
      |      ELSE 0 END)::BIGINT AS dcg,
      |    sum(CASE WHEN label = true_label THEN 1 ELSE 0 END)::BIGINT
      |      AS n_rel
      |  FROM top GROUP BY 1, 2)
      |SELECT qid, true_label, n_rel, dcg,
      |  ([13860,23100,30030,35574,40194,44154,47619,50699,53471,55991]
      |   )[least(10, n_label)]::BIGINT AS idcg,
      |  ((1000 * dcg) //
      |   ([13860,23100,30030,35574,40194,44154,47619,50699,53471,55991]
      |    )[least(10, n_label)])::BIGINT AS ndcg_pm
      |FROM g JOIN nl USING (true_label) ORDER BY qid""".stripMargin

  /** MAP@10 + MRR over the same exact retrieval — with [[evalNdcg]] the
    * full ranking-metric triad (nDCG grades the whole list shape, AP the
    * precision-ordering of relevant hits, RR the time-to-first-hit).
    * Both stay exact integers: P@k = c_k/k rides the common denominator
    * lcm(1..10) = 2520 (AP·2520·R̃ = Σ_{relevant k} c_k·(2520/k), every
    * weight whole), RR is 10⁶ div first_relevant_rank; queries with no
    * relevant hit in the top-10 ship rank 0 / rr 0 — visible, not
    * dropped. AP's denominator uses R̃ = min(10, R) (the standard
    * cutoff-aware normalization, same n_label frame as the nDCG ideal).
    *
    * Scale: identical bounded-broadcast probe scan + qid-partitioned
    * windows as [[evalNdcg]]; the running relevant count is a window
    * over ≤10 rows per query.
    */
  def evalRankBattery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (top, nLabel) = rankedTopOf(s, dir)
    val wq = Window.partitionBy($"qid").orderBy($"rn")
    val marked = top
      .withColumn("rel",
        when($"label" === $"true_label", 1L).otherwise(0L))
      .withColumn("ck", sum($"rel").over(wq))
    marked.groupBy($"qid", $"true_label")
      .agg(sum($"rel").as("n_rel"),
        sum(when($"rel" === 1L,
          $"ck" * expr("CAST(2520 AS BIGINT) div rn")).otherwise(0L))
          .as("ap_num"),
        min(when($"rel" === 1L, $"rn")).as("fr"))
      .join(nLabel, Seq("true_label"))
      .select($"qid", $"true_label", $"n_rel",
        coalesce($"fr", lit(0)).cast("long").as("first_rel_rank"),
        coalesce(expr("CAST(1000000 AS BIGINT) div fr"), lit(0L))
          .as("rr_ppm"),
        $"ap_num",
        when($"n_rel" === 0L, 0L)
          .otherwise(expr("(1000 * ap_num) div (2520 * least(10, n_label))"))
          .as("ap_pm"))
      .orderBy($"qid")
  }

  val evalRankBatterySql: String =
    """WITH qv AS (
      |  SELECT vec_id, label::BIGINT AS label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |co AS (SELECT * FROM qv WHERE vec_id >= 10),
      |qs AS (SELECT vec_id AS qid, label AS true_label, q AS qq
      |       FROM qv WHERE vec_id < 10),
      |nl AS (SELECT label AS true_label, count(*)::BIGINT AS n_label
      |       FROM co GROUP BY 1),
      |d AS (
      |  SELECT qid, true_label, vec_id, label,
      |    sum((x - y) * (x - y))::BIGINT AS d2
      |  FROM (SELECT qs.qid, qs.true_label, co.vec_id, co.label,
      |          unnest(co.q) AS x, unnest(qs.qq) AS y
      |        FROM co, qs) z
      |  GROUP BY 1, 2, 3, 4),
      |top AS (
      |  SELECT qid, true_label, label, rn,
      |    CASE WHEN label = true_label THEN 1 ELSE 0 END AS rel
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid
      |      ORDER BY d2, vec_id) AS rn FROM d) t
      |  WHERE rn <= 10),
      |m AS (
      |  SELECT *, sum(rel) OVER (PARTITION BY qid ORDER BY rn) AS ck
      |  FROM top),
      |g AS (
      |  SELECT qid, true_label, sum(rel)::BIGINT AS n_rel,
      |    sum(CASE WHEN rel = 1 THEN ck * (2520 // rn) ELSE 0 END)::BIGINT
      |      AS ap_num,
      |    min(CASE WHEN rel = 1 THEN rn END) AS fr
      |  FROM m GROUP BY 1, 2)
      |SELECT qid, true_label, n_rel,
      |  coalesce(fr, 0)::BIGINT AS first_rel_rank,
      |  coalesce(1000000 // fr, 0)::BIGINT AS rr_ppm,
      |  ap_num,
      |  (CASE WHEN n_rel = 0 THEN 0 ELSE
      |    (1000 * ap_num) // (2520 * least(10, n_label)) END)::BIGINT
      |    AS ap_pm
      |FROM g JOIN nl USING (true_label) ORDER BY qid""".stripMargin

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher, SIGIR 2009): for each probe document (the aligned
    * vec_id = doc_id < 10 query convention) fuse its VECTOR ranking
    * (exact cosine top-20, the [[cosineTopK]] channel) with its LEXICAL
    * ranking (idf-weighted distinct-word overlap top-20) via
    * RRF(d) = Σ_channels 1/(60 + rank_ch(d)), kept exact as
    * ⌊10⁶/(60+r)⌋ with absent channels contributing 0 — the standard
    * way a production RAG stack combines BM25-class and embedding
    * retrieval without score normalization (ranks are scale-free).
    *
    * Scale: the vector channel is the bounded-broadcast probe scan. The
    * lexical channel is df-PRUNED before it touches the postings: terms
    * with df > max(16, ndocs/10) — the Zipf head, i.e. stop-words — are
    * dropped from the probe vocabulary, and the surviving (tiny) weighted
    * probe-term frame BROADCASTS against the posting scan, so there is no
    * term-keyed shuffle on a Zipf-skewed key at all (VERDICT r12 #1: the
    * uncapped form paid the full posting list of every shared stop-word).
    * The score perturbation is provably bounded: every dropped term has
    * df > ndocs/10, so its idf weight 10⁶ div df < 10⁷/ndocs — at any
    * production corpus size the head terms each contribute ≈0 to a score
    * whose retained terms contribute ≥ 10⁶/(ndocs/10) each; a doc sharing
    * only stop-words with the probe was never a lexical match. Measured
    * under Zipf-honest (verbatim-replication) scaling in ScalingBench
    * (`sim_hybrid_rrf` vs the uncapped [[hybridRrfUncapped]]).
    * The fuse is a full-outer join of two ≤20-row-per-query frames. Both
    * channels end in qid-keyed windows.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy($"qid")
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", qvec($"embedding").as("q"))
      .withColumn("n2", norm2($"q"))
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    val vrank = emb.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos", round(dot($"q", $"qq").cast("double")
        / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("rv",
        row_number().over(byQ.orderBy($"cos".desc, $"vec_id")))
      .filter($"rv" <= 20)
      .select($"qid", $"vec_id".as("doc_id"), $"rv")
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w")).distinct()
    val ndocs = Tables.documents(s, dir)
      .agg(countDistinct($"doc_id").as("ndocs"))
    // corpus-relative df prune: drop the Zipf head (df > max(16, N/10))
    // BEFORE any posting access — the kept vocabulary is what a search
    // engine's stop-list leaves behind
    val dfreq = words.groupBy($"w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(ndocs))
      .filter($"df" * 10L <= $"ndocs" || $"df" <= 16L)
      .select($"w", $"df")
    // probe vocab ∩ kept terms is tiny (10 docs' tail vocabulary):
    // broadcast it against the posting scan — no shuffle on the term key
    val probeTerms = words.filter($"doc_id" < 10)
      .select($"doc_id".as("qid"), $"w")
      .join(dfreq, Seq("w"))
    val lrank = words.join(broadcast(probeTerms), Seq("w"))
      .filter($"doc_id" =!= $"qid")
      .groupBy($"qid", $"doc_id")
      .agg(sum(expr("1000000 div df")).as("lex"))
      .withColumn("rl",
        row_number().over(byQ.orderBy($"lex".desc, $"doc_id")))
      .filter($"rl" <= 20)
      .select($"qid", $"doc_id", $"rl")
    vrank.join(lrank, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr("1000000 div (60 + rv)"), lit(0L))
          + coalesce(expr("1000000 div (60 + rl)"), lit(0L)))
      .withColumn("rank",
        row_number().over(byQ.orderBy($"rrf_score".desc, $"doc_id")))
      .filter($"rank" <= 5)
      .select($"qid", $"rank".cast("long").as("rank"), $"doc_id",
        $"rrf_score", $"rv".cast("long").as("vec_rank"),
        $"rl".cast("long").as("lex_rank"))
      .orderBy($"qid", $"rank")
  }

  /** The PRE-r13 lexical channel of [[hybridRrf]], kept as a measurement
    * control only (NOT in the gate): no df prune, and the probe terms are
    * joined against the postings on the raw term key — the Zipf-skewed
    * shuffle VERDICT r12 #1 flagged. ScalingBench times this against the
    * capped form on the Zipf-honest (verbatim-replication) corpus, where
    * document frequency grows ×mult with the corpus, to put the uncapped
    * blowup and the capped flatness on record side by side.
    */
  def hybridRrfLexUncapped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy($"qid")
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w")).distinct()
    val dfreq = words.groupBy($"w").agg(count(lit(1)).as("df"))
    words.filter($"doc_id" < 10)
      .select($"doc_id".as("qid"), $"w")
      .join(words, Seq("w"))
      .filter($"doc_id" =!= $"qid")
      .join(dfreq, Seq("w"))
      .groupBy($"qid", $"doc_id")
      .agg(sum(expr("1000000 div df")).as("lex"))
      .withColumn("rl",
        row_number().over(byQ.orderBy($"lex".desc, $"doc_id")))
      .filter($"rl" <= 20)
      .select($"qid", $"doc_id", $"rl")
  }

  /** The capped lexical channel of [[hybridRrf]] alone (same code path as
    * the gate query's `lrank`), for like-for-like ScalingBench timing
    * against [[hybridRrfLexUncapped]].
    */
  def hybridRrfLexCapped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy($"qid")
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w")).distinct()
    val ndocs = Tables.documents(s, dir)
      .agg(countDistinct($"doc_id").as("ndocs"))
    val dfreq = words.groupBy($"w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(ndocs))
      .filter($"df" * 10L <= $"ndocs" || $"df" <= 16L)
      .select($"w", $"df")
    val probeTerms = words.filter($"doc_id" < 10)
      .select($"doc_id".as("qid"), $"w")
      .join(dfreq, Seq("w"))
    words.join(broadcast(probeTerms), Seq("w"))
      .filter($"doc_id" =!= $"qid")
      .groupBy($"qid", $"doc_id")
      .agg(sum(expr("1000000 div df")).as("lex"))
      .withColumn("rl",
        row_number().over(byQ.orderBy($"lex".desc, $"doc_id")))
      .filter($"rl" <= 20)
      .select($"qid", $"doc_id", $"rl")
  }

  val hybridRrfSql: String = qvecCte +
    """, dots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |vrank AS (
      |  SELECT qid, vec_id AS doc_id, rv FROM (
      |    SELECT qid, d.vec_id,
      |      row_number() OVER (PARTITION BY qid ORDER BY
      |        round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC, d.vec_id)
      |        AS rv
      |    FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |                JOIN nrm ne ON d.vec_id = ne.vec_id) t
      |  WHERE rv <= 20),
      |words AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS ndocs FROM documents),
      |dfreq AS (
      |  SELECT w, df FROM (
      |    SELECT w, count(*)::BIGINT AS df FROM words GROUP BY w) d, nd
      |  WHERE d.df * 10 <= nd.ndocs OR d.df <= 16),
      |lrank AS (
      |  SELECT qid, doc_id, rl FROM (
      |    SELECT qid, doc_id,
      |      row_number() OVER (PARTITION BY qid ORDER BY lex DESC, doc_id)
      |        AS rl
      |    FROM (
      |      SELECT p.doc_id AS qid, c.doc_id,
      |        sum(1000000 // df)::BIGINT AS lex
      |      FROM words p JOIN words c ON p.w = c.w AND p.doc_id <> c.doc_id
      |      JOIN dfreq f ON f.w = p.w
      |      WHERE p.doc_id < 10
      |      GROUP BY 1, 2) s) t
      |  WHERE rl <= 20),
      |fused AS (
      |  SELECT coalesce(v.qid, l.qid) AS qid,
      |    coalesce(v.doc_id, l.doc_id) AS doc_id,
      |    (coalesce(1000000 // (60 + v.rv), 0)
      |      + coalesce(1000000 // (60 + l.rl), 0))::BIGINT AS rrf_score,
      |    v.rv::BIGINT AS vec_rank, l.rl::BIGINT AS lex_rank
      |  FROM vrank v FULL OUTER JOIN lrank l
      |    ON v.qid = l.qid AND v.doc_id = l.doc_id)
      |SELECT qid, rank, doc_id, rrf_score, vec_rank, lex_rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
      |  FROM fused) t
      |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Radius (range) search: every corpus vector within exact cosine ≥ 0.30
    * of each probe vector (vec_id < 10) — FAISS's `range_search` contract,
    * the retrieval mode where the RESULT SIZE is data-defined (near-dup
    * audits, "everything this similar" pulls) rather than truncated at k.
    * Same fixed-point arithmetic as [[cosineTopK]]; hit counts per query
    * are deliberately variable — that variability is the signal.
    *
    * Scale: probe set broadcasts, corpus streams through one narrow
    * codegen stage, no shuffle until the (small) result sort. At
    * production radii the result is bounded by the true neighborhood
    * size; a radius so loose it returns the corpus is a caller error, and
    * the per-query counts in the output make it visible immediately.
    */
  def rangeSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = qEmb(s, dir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .filter($"cos" >= 0.30)
      .select($"qid", $"vec_id", $"cos")
      .orderBy($"qid", $"vec_id")
  }

  val rangeSearchSql: String = qvecCte +
    """, dots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2)
      |SELECT qid, d.vec_id,
      |  round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) AS cos
      |FROM dots d JOIN nrm nq ON d.qid = nq.vec_id
      |            JOIN nrm ne ON d.vec_id = ne.vec_id
      |WHERE round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) >= 0.30
      |ORDER BY qid, d.vec_id""".stripMargin

  /** Label-outlier mining: the 20 vectors FARTHEST (exact integer squared
    * L2) from their OWN label centroid — the "probably mislabeled or
    * out-of-distribution" review queue of embedding-space data cleaning
    * (the complement of [[nearestCentroid]]: that asks "which class is
    * nearest", this asks "how badly does the own class fit"). Same
    * floor-mean prototype frame; ranking and distances are exact int64,
    * so the top-20 is bit-deterministic (vec_id tie-break).
    *
    * Scale: centroid frame broadcasts; one corpus scoring pass joined on
    * the OWN label only (no |labels|× fan-out); TakeOrdered bounds the
    * result at 20 rows — nothing driver-side scales with the corpus.
    */
  def labelOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ex = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        posexplode(qvec($"embedding")).as(Seq("d", "e")))
    val cent = ex.groupBy($"label", $"d")
      .agg(floor(sum($"e").cast("double") / count(lit(1)))
        .cast("long").as("m"))
    val top = ex.join(broadcast(cent), Seq("label", "d"))
      .groupBy($"vec_id", $"label")
      .agg(sum(($"e" - $"m") * ($"e" - $"m")).as("dist"))
      .orderBy($"dist".desc, $"vec_id").limit(20)
    top.withColumn("rnk", row_number().over(
        Window.orderBy($"dist".desc, $"vec_id")).cast("long")) // 20-row frame
      .select($"rnk", $"vec_id", $"label".cast("long").as("label"), $"dist")
      .orderBy($"rnk")
  }

  val labelOutliersSql: String =
    """WITH qv AS (
      |  SELECT vec_id, label,
      |    [floor(x::DOUBLE * 10000)::BIGINT FOR x IN embedding] AS q
      |  FROM embeddings),
      |ex AS (SELECT vec_id, label, unnest(q) AS e,
      |              generate_subscripts(q, 1) - 1 AS d FROM qv),
      |cent AS (SELECT label, d,
      |    floor(sum(e)::DOUBLE / count(*))::BIGINT AS m
      |  FROM ex GROUP BY 1, 2),
      |dist AS (
      |  SELECT vec_id, any_value(label) AS label,
      |    sum((e - m) * (e - m))::BIGINT AS dist
      |  FROM ex JOIN cent USING (label, d) GROUP BY vec_id)
      |SELECT row_number() OVER (ORDER BY dist DESC, vec_id) AS rnk,
      |  vec_id, label::BIGINT AS label, dist
      |FROM dist ORDER BY dist DESC, vec_id LIMIT 20""".stripMargin

  /** Recall@k CURVE for the hyperplane-LSH index: recall at k = 1, 2, 3
    * in one query — [[lshRecall]] gives the k = 3 point; the curve shows
    * whether the index degrades gracefully as the caller tightens k (an
    * index can look fine at k = 3 while its rank-1 neighbor is usually
    * wrong — exactly what k = 1 exposes). Both sides truncated to the
    * SAME k per point; counts exact-integer, recall in floor permille.
    *
    * Scale: exact and approx top-3 lists computed once each (the same
    * bounded frames the recall query builds), one (qid, vec_id) join,
    * then three conditional counts in ONE aggregation — the
    * [[graft.operators.TextOps.thresholdCurve]] trick: k points cost one
    * pass, not k.
    */
  def recallCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = cosineTopK(s, dir).filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"rn".as("re"))
    val approx = lshTopK(s, dir)
      .select($"qid".as("aq"), $"vec_id".as("av"), $"rn".as("ra"))
    val joined = exact.join(approx,
        $"qid" === $"aq" && $"vec_id" === $"av", "left")
      .select($"re", $"ra")
    val ks = Seq(1, 2, 3)
    val aggs = ks.flatMap(k => Seq(
      count(when($"re" <= k, lit(1))).as(s"e$k"),
      count(when($"re" <= k && $"ra" <= k, lit(1))).as(s"h$k")))
    joined.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ks.map(k => struct(lit(k.toLong).as("k"),
        col(s"e$k").as("n_exact"), col(s"h$k").as("n_hit"))): _*)).as("e"))
      .select($"e.k".as("k"), $"e.n_exact".as("n_exact"),
        $"e.n_hit".as("n_hit"),
        floor(lit(1000L) * $"e.n_hit" / greatest($"e.n_exact", lit(1L)))
          .cast("long").as("recall_pm"))
      .orderBy($"k")
  }

  lazy val recallCurveSql: String =
    s"""WITH e0 AS ($cosineTopKSql),
       |e AS (SELECT qid, vec_id, rn AS re FROM e0 WHERE rn <= 3),
       |a AS ($lshTopKSql),
       |j AS (
       |  SELECT e.re, a.rn AS ra
       |  FROM e LEFT JOIN a ON e.qid = a.qid AND e.vec_id = a.vec_id),
       |k AS (SELECT unnest([1, 2, 3]) AS k)
       |SELECT k::BIGINT AS k,
       |  (SELECT count(*) FROM j WHERE re <= k)::BIGINT AS n_exact,
       |  (SELECT count(*) FROM j WHERE re <= k AND ra <= k)::BIGINT AS n_hit,
       |  ((1000 * (SELECT count(*) FROM j WHERE re <= k AND ra <= k))
       |    // greatest((SELECT count(*) FROM j WHERE re <= k), 1))::BIGINT
       |    AS recall_pm
       |FROM k ORDER BY k""".stripMargin

  /** SQ8 ranking quality as SPEARMAN's ρ: per probe query, the rank
    * correlation between the code-only ranking and the exact-cosine
    * ranking over the WHOLE corpus — the eval that catches what recall@k
    * can't (an index can nail the top-3 while garbling the rest of the
    * ordering; reranking and calibration layers care about the rest).
    * Both rankings totally ordered (score desc, vec_id), so d² is
    * deterministic; ρ = 1 − 6Σd²/(n(n²−1)) is computed CROSS-MULTIPLIED
    * into exact integers — no float ever crosses engines.
    *
    * Scale: two broadcast-probe corpus scans (exact + codes — the second
    * reads the 8×-smaller code column), two bounded rank windows keyed
    * by qid, one (qid, vec_id) join, one mergeable Σd² agg.
    */
  def sqSpearman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = qEmb(s, dir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"q".as("qq"), $"n2".as("qn2"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos",
        round(dot($"q", $"qq").cast("double")
          / (sqrt($"n2".cast("double")) * sqrt($"qn2".cast("double"))), 4))
      .withColumn("re", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id"))
        .cast("long"))
      .select($"qid", $"vec_id", $"re")
    val approx = sqScored(s, dir)
      .withColumn("ra", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos_sq".desc, $"vec_id"))
        .cast("long"))
      .select($"qid", $"vec_id", $"ra")
    exact.join(approx, Seq("qid", "vec_id"))
      .groupBy($"qid")
      .agg(count(lit(1)).as("n"),
        sum(($"re" - $"ra") * ($"re" - $"ra")).as("sum_d2"))
      .select($"qid", $"n", $"sum_d2",
        floor((lit(1000L) * ($"n" * ($"n" * $"n" - 1L))
          - lit(6000L) * $"sum_d2")
          / ($"n" * ($"n" * $"n" - 1L))).cast("long").as("rho_pm"))
      .orderBy($"qid")
  }

  lazy val sqSpearmanSql: String = qvecCte + sqCtes +
    """, edots AS (
      |  SELECT qid, vec_id, sum(x * y) AS d FROM (
      |    SELECT q.vec_id AS qid, e.vec_id,
      |           unnest(q.q) AS x, unnest(e.q) AS y
      |    FROM (SELECT vec_id, q FROM qv WHERE vec_id < 10) q
      |    JOIN qv e ON e.vec_id <> q.vec_id) z
      |  GROUP BY 1, 2),
      |erank AS (
      |  SELECT edots.qid, edots.vec_id,
      |    row_number() OVER (PARTITION BY edots.qid ORDER BY
      |      round(d / (sqrt(nq.n2) * sqrt(ne.n2)), 4) DESC, edots.vec_id)
      |      ::BIGINT AS re
      |  FROM edots JOIN nrm nq ON edots.qid = nq.vec_id
      |             JOIN nrm ne ON edots.vec_id = ne.vec_id),
      |arank AS (
      |  SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY cos_sq DESC, vec_id)::BIGINT AS ra
      |  FROM sqscored),
      |dd AS (
      |  SELECT e.qid, count(*)::BIGINT AS n,
      |    sum((e.re - a.ra) * (e.re - a.ra))::BIGINT AS sum_d2
      |  FROM erank e JOIN arank a
      |    ON e.qid = a.qid AND e.vec_id = a.vec_id
      |  GROUP BY e.qid)
      |SELECT qid, n, sum_d2,
      |  ((1000 * (n * (n * n - 1)) - 6000 * sum_d2)
      |    // (n * (n * n - 1)))::BIGINT AS rho_pm
      |FROM dd ORDER BY qid""".stripMargin

  // ---- exact covariance / Gram matrix over the embedding corpus ----

  /** Exact integer covariance matrix of the embedding corpus — the
    * primitive under PCA, whitening, and covariance-shift drift tests.
    * Dims are quantized with the repo's standard exact embedding
    * quantization (floor(x·10⁴), Similarity.scala:31) and the UNnormalized
    * covariance numerator `n·Σqᵢqⱼ − Σqᵢ·Σqⱼ` is emitted per upper-
    * triangle pair (i ≤ j) in exact int64 (max |term| ≈ 7·10¹² at gate
    * scale, far under 2⁵³ — both engines exact, hash-gateable; divide by
    * n² off-engine for the float covariance).
    *
    * Scale shape — the reason this is NOT the naive dim-pair self-join:
    * each vector emits its d(d+1)/2 upper-triangle products via a
    * generated struct array, and the very next operator is a
    * partial-aggregating groupBy(i,j): every task folds its vectors into
    * ≤ 2,080 accumulator rows BEFORE the exchange, so the shuffle carries
    * parts·d² rows regardless of corpus size — a mergeable Gram-matrix
    * accumulation (one corpus scan, O(d²) state), where the equivalent
    * `q JOIN q ON vec_id` plan the oracle runs would shuffle corpus·d²/2
    * rows. Per-dim sums and n ride one 64-row broadcast.
    */
  def covarianceMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    covNumFrame(s, dir).orderBy($"i", $"j")
  }

  /** The unsorted upper-triangle covariance-numerator frame (i ≤ j,
    * cov_num = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) — [[covarianceMatrix]]'s body, shared
    * with [[pcaPower]] which consumes it re-shuffled and must not pay
    * the presentation sort.
    */
  private def covNumFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 64
    val q = Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding",
          x => floor(x.cast("double") * 10000d).cast("long")).as("q"))
    val tri = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at($"q", i + 1) * element_at($"q", j + 1)).as("v")))))
    val prods = q.select(explode(tri).as("e"))
      .select($"e.i".as("i"), $"e.j".as("j"), $"e.v".as("v"))
      .groupBy($"i", $"j")
      .agg(sum($"v").as("sxy"))
    val dims = q.select(posexplode($"q").as(Seq("i", "v")))
      .groupBy($"i")
      .agg(sum($"v").as("sx"), count(lit(1)).as("n"))
    prods
      .join(broadcast(dims.select($"i", $"sx".as("sx_i"), $"n")), Seq("i"))
      .join(broadcast(dims.select($"i".as("j"), $"sx".as("sx_j"))), Seq("j"))
      .select($"i".cast("long"), $"j".cast("long"),
        ($"n" * $"sxy" - $"sx_i" * $"sx_j").as("cov_num"))
  }

  /** Top principal component of the embedding corpus by fixed-point
    * power iteration — PCA's workhorse step (von Mises–Pollaczek 1929;
    * Halko et al. 2011 §4 for why matrix-free products are THE scale
    * form), run entirely on the ≤2,080-row folded covariance so the
    * corpus is touched exactly once however many iterations run.
    * Eigenvectors are invariant under positive scaling of the matrix,
    * so the iteration uses the integer covariance NUMERATOR, pre-shifted
    * by the data-dependent s = max(0, bitlength(max|C|) − 36) keeping
    * |Cs| < 2³⁶: with the iterate rescaled to |v| ≤ 2²⁰ each round,
    * every Σⱼ Cs·vⱼ stays under 2³⁶⁺²⁰⁺⁶ = 2⁶² — exact int64 in both
    * engines at ANY corpus size (the shift grows with the data; the
    * floor-div perturbations are the standard fixed-point price and
    * identical cross-engine, so the oracle is an exact hash gate).
    * Every signed division is sign-factored (the stat_group_ols rule).
    *
    * Output: per dim, the last two iterates (v_prev, v_top) — their
    * proportionality is the convergence read, and their BigInt cosine
    * is law-tested in PcaPowerSpec.
    *
    * Scale: ONE corpus scan (the mergeable Gram fold, O(d²) state);
    * the 8 rounds run on 64-row frames — each one joined against the
    * 4,096-row matrix and checkpointed (the BPE-chain rule: the iterate
    * is referenced twice per round, so an unpinned chain doubles the DAG
    * per round). The per-round 1-row max frames are the house
    * bounded-broadcast cross shape; the A/B note inside the loop records
    * why this keeps the r16 post-rescale pin while lsa/hits moved to the
    * pre-rescale pin.
    */
  def pcaPower(s: SparkSession, dir: String, iters: Int = 8): DataFrame = {
    import s.implicits._
    val cn = covNumFrame(s, dir)
    val full = cn.select($"i", $"j", $"cov_num")
      .unionByName(cn.where($"i" =!= $"j")
        .select($"j".as("i"), $"i".as("j"), $"cov_num"))
      .pin(true) // the shift fold + every round re-read it
    val sh = full.agg(max(abs($"cov_num")).as("mc"))
      .select(greatest(lit(0L),
        (length(bin($"mc")) - 36).cast("long")).as("sh"))
    val cs = full.crossJoin(sh)
      .select($"i", $"j",
        expr("""(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END) *
               (abs(cov_num) div shiftleft(CAST(1 AS BIGINT),
                                           CAST(sh AS INT)))""").as("c"))
      .pin(true) // re-joined every round
    var v = s.range(64).select($"id".cast("long").as("i"),
      lit(1048576L).as("v"))
    var prev = v
    // A/B-measured r17: three loop shapes were benched at 5 iterations
    // each — (a) this r16 form (pin the post-rescale v; the divisor's
    // broadcast subtree recomputes u, but the duplicate runs in PARALLEL
    // with the main stream under AQE), (b) pin the pre-rescale u +
    // broadcast(v) (the lsa/hits treatment), (c) this form + broadcast(v).
    // (a) measured fastest (3.98 s in a loud window, 3.18 clean) vs (b)
    // 4.77 / (c) 4.37: every loop frame here is BOUNDED (4,096-row
    // matrix, 64-row iterate) at any corpus size, so the deduped work is
    // negligible while (b)'s divisor→broadcast→join chain SERIALIZES
    // stages that (a) overlaps, and (c)'s per-round broadcast build
    // blocks both join copies. The pre-rescale pin stays the right move
    // for lsa/hits/BT where the recomputed subtree is corpus/|E|-sized.
    for (_ <- 1 to iters) {
      val u = cs.join(v.select($"i".as("j"), $"v"), Seq("j"))
        .select($"i", ($"c" * $"v").as("t"))
        .groupBy($"i").agg(sum($"t").as("u"))
      val dv = u.agg(max(abs($"u")).as("mu"))
        .select((expr("mu div 1048576") + 1L).as("dv"))
      prev = v
      v = u.crossJoin(dv)
        .select($"i",
          expr("""(CASE WHEN u < 0 THEN -1 ELSE 1 END) *
                 (abs(u) div dv)""").as("v"))
        .pin(true) // referenced twice next round (product + max)
    }
    prev.select($"i", $"v".as("v_prev"))
      .join(v.select($"i", $"v".as("v_top")), Seq("i"))
      .orderBy($"i")
  }

  val pcaPowerSql: String = {
    // every multiply-referenced CTE is AS MATERIALIZED — DuckDB inlines
    // plain CTEs per reference, and v_k reads u_k twice (max + rescale),
    // so the 8-round chain would otherwise inline the covariance
    // pipeline 2^8 times (the graph_mst round-chain lesson, PLANS.md r13)
    def round(k: Int): String =
      s""",
         |u$k AS MATERIALIZED (
         |  SELECT cs.i, sum(cs.c * v${k - 1}.v)::BIGINT AS u
         |  FROM cs JOIN v${k - 1} ON cs.j = v${k - 1}.i GROUP BY 1),
         |d$k AS (SELECT (max(abs(u)) // 1048576 + 1)::BIGINT AS dv
         |        FROM u$k),
         |v$k AS MATERIALIZED (
         |  SELECT i, ((CASE WHEN u < 0 THEN -1 ELSE 1 END) *
         |             (abs(u) // dv))::BIGINT AS v
         |  FROM u$k CROSS JOIN d$k)""".stripMargin
    """WITH q AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS v
      |  FROM embeddings),
      |dims AS (SELECT i, sum(v) AS sx, count(*) AS n FROM q GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sxy
      |      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY 1, 2),
      |cn AS MATERIALIZED (
      |  SELECT p.i, p.j, (di.n * p.sxy - di.sx * dj.sx)::BIGINT AS c
      |  FROM p JOIN dims di ON di.i = p.i JOIN dims dj ON dj.i = p.j),
      |fm AS MATERIALIZED (SELECT i, j, c FROM cn
      |       UNION ALL SELECT j, i, c FROM cn WHERE i <> j),
      |sh AS (SELECT greatest(0, length(bin(max(abs(c)))) - 36)::BIGINT
      |         AS sh FROM fm),
      |cs AS MATERIALIZED (
      |  SELECT i, j, ((CASE WHEN c < 0 THEN -1 ELSE 1 END) *
      |    (abs(c) // (1::BIGINT << sh)))::BIGINT AS c
      |  FROM fm CROSS JOIN sh),
      |v0 AS (SELECT unnest(range(0, 64))::BIGINT AS i,
      |         1048576::BIGINT AS v)""".stripMargin +
      (1 to 8).map(round).mkString +
      """
        |SELECT v7.i, v7.v AS v_prev, v8.v AS v_top
        |FROM v7 JOIN v8 USING (i) ORDER BY i""".stripMargin
  }

  val covarianceMatrixSql: String =
    """WITH q AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS v
      |  FROM embeddings),
      |dims AS (SELECT i, sum(v) AS sx, count(*) AS n FROM q GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sxy
      |      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY 1, 2)
      |SELECT p.i, p.j,
      |  (di.n * p.sxy - di.sx * dj.sx)::BIGINT AS cov_num
      |FROM p JOIN dims di ON di.i = p.i JOIN dims dj ON dj.i = p.j
      |ORDER BY p.i, p.j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_covariance" -> covarianceMatrix _,
    "emb_pca_power" -> ((s: SparkSession, dir: String) => pcaPower(s, dir)),
    "sim_sq_spearman" -> sqSpearman _,
    "sim_recall_curve" -> recallCurve _,
    "sim_pq_distortion" -> pqDistortion _,
    "sim_outliers" -> labelOutliers _,
    "sim_nearest_centroid" -> nearestCentroid _,
    "sim_knn_classify" -> knnClassify _,
    "eval_ndcg" -> evalNdcg _,
    "eval_rank_battery" -> evalRankBattery _,
    "sim_hybrid_rrf" -> hybridRrf _,
    "sim_label_prop" -> labelProp _,
    "sim_range_search" -> rangeSearch _,
    "sim_mmr_rerank" -> mmrRerank _,
    "sim_sq_topk" -> sqTopK _,
    "sim_sq_recall" -> sqRecall _,
    "sim_cosine_topk" -> cosineTopK _,
    "sim_hard_negatives" -> hardNegatives _,
    "sim_drift" -> drift _,
    "sim_ivf_refresh" -> ivfRefresh _,
    "sim_ivf_split" -> ivfSplit _,
    "sim_ivf_forget" -> ivfForget _,
    "sim_quantize_err" -> quantizeErr _,
    "sim_lsh_recall" -> lshRecall _,
    "sim_label_centroids" -> labelCentroids _,
    "sim_neardup_pairs" -> nearDupPairs _,
    "sim_semantic_clusters" -> semanticClusters _,
    "sim_dbscan" -> dbscanClusters _,
    "sim_dbscan_ivf" ->
      ((s: SparkSession, dir: String) => dbscanIvfClusters(s, dir)),
    "sim_lsh_buckets" -> lshBuckets _,
    "sim_lsh_topk" -> lshTopK _,
    "sim_ivf_assign" -> ivfAssign _,
    "sim_silhouette" ->
      ((s: SparkSession, dir: String) => simSilhouette(s, dir)),
    "sim_ivf_balance" -> ivfBalance _,
    "sim_ivf_topk" -> ivfTopK _,
    "sim_ivf_recall" -> ivfRecall _,
    "sim_pq_topk" -> pqTopK _,
    "sim_pq_recall" -> pqRecall _,
    "sim_ivfpq_topk" -> ivfPqTopK _,
    "dedup_semantic" -> semanticDedup _,
    "sim_knn_graph" -> ((s: SparkSession, d: String) => knnGraph(s, d)),
    "sim_mips_topk" -> mipsTopK _,
    "sim_matryoshka_recall" -> matryoshkaRecall _,
    "sim_diversity_sample" -> ((s: SparkSession, dir: String) =>
      diversitySample(s, dir)),
  )

  val oracles: Map[String, String] = Map(
    "emb_covariance" -> covarianceMatrixSql,
    "emb_pca_power" -> pcaPowerSql,
    "sim_sq_spearman" -> sqSpearmanSql,
    "sim_recall_curve" -> recallCurveSql,
    "sim_pq_distortion" -> pqDistortionSql,
    "sim_outliers" -> labelOutliersSql,
    "sim_nearest_centroid" -> nearestCentroidSql,
    "sim_knn_classify" -> knnClassifySql,
    "eval_ndcg" -> evalNdcgSql,
    "eval_rank_battery" -> evalRankBatterySql,
    "sim_hybrid_rrf" -> hybridRrfSql,
    "sim_label_prop" -> labelPropSql,
    "sim_range_search" -> rangeSearchSql,
    "sim_mmr_rerank" -> mmrRerankSql,
    "sim_sq_topk" -> sqTopKSql,
    "sim_sq_recall" -> sqRecallSql,
    "sim_cosine_topk" -> cosineTopKSql,
    "sim_hard_negatives" -> hardNegativesSql,
    "sim_drift" -> driftSql,
    "sim_ivf_refresh" -> ivfRefreshSql,
    "sim_ivf_split" -> ivfSplitSql,
    "sim_ivf_forget" -> ivfForgetSql,
    "sim_quantize_err" -> quantizeErrSql,
    "sim_lsh_recall" -> lshRecallSql,
    "sim_label_centroids" -> labelCentroidsSql,
    "sim_neardup_pairs" -> nearDupPairsSql,
    "sim_semantic_clusters" -> semanticClustersSql,
    "sim_dbscan" -> dbscanClustersSql,
    "sim_dbscan_ivf" -> dbscanIvfClustersSql,
    "sim_silhouette" -> simSilhouetteSql,
    "sim_lsh_buckets" -> lshBucketsSql,
    "sim_lsh_topk" -> lshTopKSql,
    "sim_ivf_assign" -> ivfAssignSql,
    "sim_ivf_balance" -> ivfBalanceSql,
    "sim_ivf_topk" -> ivfTopKSql,
    "sim_ivf_recall" -> ivfRecallSql,
    "sim_pq_topk" -> pqTopKSql,
    "sim_pq_recall" -> pqRecallSql,
    "sim_ivfpq_topk" -> ivfPqTopKSql,
    "dedup_semantic" -> semanticDedupSql,
    "sim_knn_graph" -> knnGraphSql,
    "sim_mips_topk" -> mipsTopKSql,
    "sim_matryoshka_recall" -> matryoshkaRecallSql,
    "sim_diversity_sample" -> diversitySampleSql,
  )
}
