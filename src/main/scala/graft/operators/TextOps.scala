package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.Pin.PinOps

/** Text-analysis + deduplication operators over `documents` — the
  * LLM-training-data-pipeline surface (builder prompt; SURVEY.md §7.2 M5).
  *
  * Everything here is built from codegen'd built-in expressions (no UDFs),
  * and every hash/score is defined over *integer arithmetic* (token codes
  * from `ascii`, polynomial folds mod a prime) so the DuckDB oracle computes
  * bit-identical values — cross-engine float divergence is designed out.
  *
  * Scale notes: token explode → distinct → groupBy is the standard
  * inverted-index shape (shuffles on token then doc_id; both map-side
  * combinable). MinHash-LSH candidate pairs join on (band, signature) —
  * the 100 TB path, since bucket sizes stay bounded while the naive
  * all-pairs join (kept as the Jaccard verification baseline) is O(n²).
  */
object TextOps {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val A = Seq(1103L, 12289L, 52361L, 84631L, 11213L, 91099L, 30011L, 70607L)
  private val B = Seq(12007L, 24001L, 33023L, 47093L, 59063L, 71411L, 83477L, 95789L)

  /** Whitespace token stream: (doc_id, w), distinct per doc.
    * Docs are single-space separated (verified on the corpus).
    */
  private def tokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .distinct()
  }

  /** Integer token code: first 3 chars packed base-256 + length, then the
    * LAST char appended in a further base-256 digit. The tail character
    * matters: with only a prefix + length, any two tokens agreeing on
    * their first 3 chars and length collide unconditionally ("running" /
    * "runtime"), which collapses distinct vocabulary into one sketch
    * input — measured on a 10× suffix-disambiguated corpus, that collapse
    * (not bucket math) was what inflated LSH candidate pairs ~quadratically.
    * Bound: < 2^26 · 256 = 2^34, so A_max·code + B < 2^51 stays exact in
    * int64 AND float64 in both engines. `ascii('') = 0` in both engines
    * covers words shorter than 3 chars.
    */
  private[operators] def tokenCode(w: Column): Column =
    ((ascii(substring(w, 1, 1)).cast("long") * 65536L
      + ascii(substring(w, 2, 1)).cast("long") * 256L
      + ascii(substring(w, 3, 1)).cast("long")
      + length(w).cast("long")) * 256L
      + ascii(w.substr(length(w), lit(1))).cast("long"))

  private[operators] val tokenCodeSql =
    """((ascii(substr(w,1,1))::BIGINT * 65536
      | + ascii(substr(w,2,1))::BIGINT * 256
      | + ascii(substr(w,3,1))::BIGINT + length(w)::BIGINT) * 256
      | + ascii(substr(w,length(w),1))::BIGINT)""".stripMargin
      .replace("\n", " ")

  private val tokCte =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |codes AS (SELECT doc_id, $tokenCodeSql AS code FROM tok)
       |""".stripMargin

  // ---- text statistics ----

  /** Token counting + length stats via pure length arithmetic (identical
    * semantics in both engines; no regex divergence).
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        length($"text").as("char_len"),
        (length($"text") - length(regexp_replace($"text", lit(" "), lit(""))) + 1)
          .as("n_words"))
      .withColumn("avg_word_len",
        round(($"char_len" - $"n_words" + 1).cast("double") / $"n_words", 3))
      .withColumn("bpe_est", ceil($"char_len" / 4.0).cast("long"))
      .orderBy($"doc_id")
  }

  val textStatsSql: String =
    """SELECT doc_id, length(text) AS char_len,
      |  length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
      |  round((length(text) - (length(text) - length(replace(text,' ',''))+1) + 1)
      |        * 1.0 / (length(text) - length(replace(text,' ','')) + 1), 3)
      |    AS avg_word_len,
      |  ceil(length(text) / 4.0)::BIGINT AS bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: whole-word marker occurrence counts via
    * replace-arithmetic on space-padded text, argmax with a fixed
    * tie-break order. (On this corpus all text is the same word soup, so
    * the interesting property is formula parity, not accuracy.)
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    langPreds(s, dir).orderBy($"doc_id")
  }

  /** Unsorted (doc_id, lang, s_*, pred_lang) scoring frame shared by
    * [[langId]] (adds the presentation sort) and [[langIdConfusion]]
    * (aggregates immediately — a sort here would be a wasted exchange).
    */
  private def langPreds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = concat(lit(" "), $"text", lit(" "))
    def occ(m: String): Column =
      ((length(p) - length(regexp_replace(p, lit(m), lit("")))) / m.length)
        .cast("long")
    val sEn = (occ(" the ") + occ(" a ")).as("s_en")
    val sDe = (occ(" der ") + occ(" und ")).as("s_de")
    val sEs = (occ(" el ") + occ(" los ")).as("s_es")
    val sFr = (occ(" le ") + occ(" la ")).as("s_fr")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", sEn, sDe, sEs, sFr)
      .withColumn("pred_lang",
        when($"s_en" >= $"s_de" && $"s_en" >= $"s_es" && $"s_en" >= $"s_fr", "en")
          .when($"s_de" >= $"s_es" && $"s_de" >= $"s_fr", "de")
          .when($"s_es" >= $"s_fr", "es")
          .otherwise("fr"))
  }

  /** Classifier EVALUATION surface: the (true lang × predicted lang)
    * confusion matrix of the marker heuristic, with per-true-language
    * permille shares — the quality report a curator reads before trusting
    * a language filter at corpus scale. One aggregation over the scoring
    * map plus one language-partitioned window on the ≤|langs|² matrix
    * frame; the corpus is touched once.
    */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    langPreds(s, dir)
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("permille",
        floor($"n" * 1000L
          / sum($"n").over(Window.partitionBy($"lang"))).cast("long"))
      .orderBy($"lang", $"pred_lang")
  }

  /** Top LATENT SEMANTIC direction (LSA — Deerwester et al. 1990) of the
    * tf·idf term–document matrix, by power iteration that NEVER FORMS
    * THE GRAM: u ← A·v (term side), v ← Aᵀ·u (doc side), 4 pinned
    * ping-pong rounds, each one keyed join + keyed sum over the sparse
    * (term, doc, weight) triples — where [[graft.operators.Similarity]]'s
    * emb_pca_power materializes a 64×64 covariance (right for dense
    * embeddings), a term–doc matrix at corpus scale has a vocabulary-
    * sized Gram that must never exist; iterating on the triples is the
    * standard sparse-SVD shape (one pass per half-round, work ∝ nnz).
    * Integer-exact throughout: idf = bitlength(N div df) (the log2-bucket
    * idf, exact in both engines — the langNb bits trick), per-round
    * rescale by max|u| div 2²⁰ + 1 (the emb_pca_power normalization).
    * Start vector all-ones; A is nonnegative so the iterate stays
    * nonnegative — no sign indeterminacy. Output: the top-10 terms by
    * loading — the corpus's dominant topic axis.
    */
  def lsaPower(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
    val tf = toks.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
      .pin(true) // df agg + the weight join
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val dfq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val triples = tf.join(dfq, Seq("w")).crossJoin(broadcast(nDocs))
      .select($"w", $"doc_id",
        ($"tf" * length(bin(expr("n div df")))).as("wt"))
      .pin(true) // re-joined every half-round
    var v = Tables.documents(s, dir)
      .select($"doc_id", lit(1048576L).as("v"))
    var u = triples.limit(0).select($"w", lit(0L).as("u")) // replaced below
    for (_ <- 1 to iters) {
      // pin the PRE-rescale half-round aggregate (u0/v0): the max-divisor
      // agg and the rescale projection both read it, so pinning the
      // POST-rescale frame (the r16 shape) recomputed the nnz-sized
      // triples⋈iterate join+agg TWICE per half-round — once under the
      // divisor's broadcast subtree, once on the main stream (guide §2.4).
      // The rescaled u/v stay lazy: two cheap scans of the pinned
      // vocabulary/doc-bounded aggregate replace a second corpus-shaped
      // join.
      val u0 = triples.join(v, Seq("doc_id"))
        .groupBy($"w").agg(sum($"wt" * $"v").as("u"))
        .pin(true) // max-divisor agg + rescale both read it
      val du = u0.agg((expr("max(abs(u)) div 1048576") + 1L).as("d"))
      u = u0.crossJoin(broadcast(du))
        .select($"w", expr("u div d").as("u"))
      val v0 = triples.join(u, Seq("w"))
        .groupBy($"doc_id").agg(sum($"wt" * $"u").as("s"))
        .pin(true) // max-divisor agg + rescale both read it
      val dv = v0.agg((expr("max(abs(s)) div 1048576") + 1L).as("d"))
      v = v0.crossJoin(broadcast(dv))
        .select($"doc_id", expr("s div d").as("v"))
    }
    u.orderBy($"u".desc, $"w").limit(10)
      .select($"w".as("term"), $"u".as("loading"))
  }

  lazy val lsaPowerSql: String = {
    def round(k: Int): String =
      s""",
         |u$k AS MATERIALIZED (
         |  SELECT w, sum(wt * v)::BIGINT AS u
         |  FROM triples JOIN v${k - 1} USING (doc_id) GROUP BY w),
         |du$k AS (SELECT (max(abs(u)) // 1048576 + 1)::BIGINT AS d
         |         FROM u$k),
         |us$k AS MATERIALIZED (
         |  SELECT w, (u // d)::BIGINT AS u FROM u$k CROSS JOIN du$k),
         |w$k AS MATERIALIZED (
         |  SELECT doc_id, sum(wt * u)::BIGINT AS s
         |  FROM triples JOIN us$k USING (w) GROUP BY doc_id),
         |dv$k AS (SELECT (max(abs(s)) // 1048576 + 1)::BIGINT AS d
         |         FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT doc_id, (s // d)::BIGINT AS v
         |  FROM w$k CROSS JOIN dv$k)""".stripMargin
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf
      |       FROM toks GROUP BY 1, 2),
      |dfq AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w),
      |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      |triples AS MATERIALIZED (
      |  SELECT w, doc_id, (tf * length(bin(n // df)))::BIGINT AS wt
      |  FROM tf JOIN dfq USING (w) CROSS JOIN nn),
      |v0 AS (SELECT doc_id, 1048576::BIGINT AS v FROM documents)"""
      .stripMargin +
      (1 to 4).map(round).mkString +
      "\nSELECT w AS term, u AS loading FROM us4 " +
      "ORDER BY loading DESC, term LIMIT 10"
  }

  /** Katz centrality (1953) on the contracted near-dup graph — the
    * path-counting complement of [[pageRankGroups]]: each node scores
    * Σ_k β^k · (walks of length k into it) with attenuation β = 1/2,
    * computed as 3 pinned rounds of r ← 10⁶ + (Σ_in r) div 2 in exact
    * integer arithmetic (the fixed-round doctrine; β as an integer div
    * keeps both engines bit-identical). Where PageRank normalizes by
    * out-degree (a random surfer), Katz counts raw walks — a family
    * adjacent to two hubs outscores one adjacent to two leaves even at
    * equal degree, the "connected to important things" signal.
    *
    * Headroom: r_k ≤ 10⁶·(d_max/2)^k — int64-safe at the pinned 3 rounds
    * while 10⁶·(d_max/2)³ < 2⁶³−1, i.e. d_max ≤ ~41.9k (2·(2⁶³/10⁶)^⅓);
    * the contracted graph's degrees sit orders below.
    *
    * Scale: per round one edge⋈rank join + one dst-keyed sum over the
    * group-contracted edge frame — the [[pageRankBsp]] shape without the
    * degree join.
    */
  def katzGroups(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val nodes = groupFrame(s, dir).select($"gid")
    val pairs = groupPairsOf(s, dir).pin(true) // union reads it twice
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionByName(pairs.select($"b".as("src"), $"a".as("dst")))
      .pin(true) // re-joined every round
    var r = nodes.select($"gid", lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val in = edges.join(r.withColumnRenamed("gid", "src"), "src")
        .groupBy($"dst".as("gid")).agg(sum($"r").as("s"))
      r = nodes.join(in, Seq("gid"), "left")
        .select($"gid",
          (lit(1000000L) + expr("coalesce(s, 0) div 2")).as("r"))
    }
    r.select($"gid", $"r".as("katz")).orderBy($"gid")
  }

  lazy val katzGroupsSql: String = {
    def iterCte(k: Int): String =
      s""",
         |k$k AS (
         |  SELECT n.gid,
         |    (1000000 + COALESCE(c.s, 0) // 2)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS gid, sum(r.r)::BIGINT AS s
         |    FROM edges e JOIN k${k - 1} r ON e.src = r.gid
         |    GROUP BY e.dst) c ON n.gid = c.gid)""".stripMargin
    groupGraphCte +
      """, nodes AS (SELECT gid FROM g),
        |edges AS (SELECT a AS src, b AS dst FROM gp
        |          UNION ALL SELECT b, a FROM gp),
        |k0 AS (SELECT gid, 1000000::BIGINT AS r FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT gid, r AS katz FROM k3 ORDER BY gid"
  }

  /** Cohen's kappa (1960) between the marker-heuristic language
    * prediction and the labeled language — the CHANCE-CORRECTED
    * agreement statistic [[langIdConfusion]]'s raw diagonal can't give
    * (a classifier that always answers "en" on an 80%-English corpus
    * gets 80% raw agreement and κ ≈ 0). Fully integer until the last
    * division: κ = (N·Σdiag − Σ_l r_l·c_l) / (N² − Σ_l r_l·c_l), with
    * row/column marginals full-outer-joined so labels with no
    * predictions (zh has no marker class) still enter the chance term.
    *
    * Scale: rides the one langPreds corpus pass; everything after is
    * ≤|langs|²-row arithmetic.
    */
  def cohensKappa(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cm = langPreds(s, dir).groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n")).pin(true) // bounded |langs|² frame
    val rows = cm.groupBy($"lang").agg(sum($"n").as("r"))
    val cols = cm.groupBy($"pred_lang".as("lang")).agg(sum($"n").as("c"))
    val agree = cm.filter($"lang" === $"pred_lang")
      .agg(coalesce(sum($"n"), lit(0L)).as("d"))
    val tot = cm.agg(sum($"n").as("nn"))
    val chance = rows.join(cols, Seq("lang"), "full")
      .select((coalesce($"r", lit(0L)) * coalesce($"c", lit(0L))).as("rc"))
      .agg(sum($"rc").as("s_rc"))
    agree.crossJoin(broadcast(tot)).crossJoin(broadcast(chance))
      .select($"nn".as("n"), $"d".as("n_agree"),
        round($"d".cast("double") / $"nn", 4).as("p_observed"),
        round($"s_rc".cast("double") / ($"nn" * $"nn"), 4).as("p_expected"),
        round(($"nn" * $"d" - $"s_rc").cast("double")
          / ($"nn" * $"nn" - $"s_rc").cast("double"), 4).as("kappa"))
  }

  // lazy: langIdSql is declared later in the object (initialization order)
  lazy val cohensKappaSql: String =
    s"""WITH p AS (${"\n"}$langIdSql),
       |cm AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
       |       FROM p GROUP BY 1, 2),
       |rws AS (SELECT lang, sum(n)::BIGINT AS r FROM cm GROUP BY lang),
       |cls AS (SELECT pred_lang AS lang, sum(n)::BIGINT AS c
       |        FROM cm GROUP BY 1),
       |ag AS (SELECT coalesce(sum(n), 0)::BIGINT AS d FROM cm
       |       WHERE lang = pred_lang),
       |tt AS (SELECT sum(n)::BIGINT AS nn FROM cm),
       |ch AS (
       |  SELECT sum(coalesce(r, 0) * coalesce(c, 0))::BIGINT AS s_rc
       |  FROM rws FULL OUTER JOIN cls USING (lang))
       |SELECT nn AS n, d AS n_agree,
       |  round(d::DOUBLE / nn, 4) AS p_observed,
       |  round(s_rc::DOUBLE / (nn * nn), 4) AS p_expected,
       |  round((nn * d - s_rc)::DOUBLE / (nn * nn - s_rc)::DOUBLE, 4)
       |    AS kappa
       |FROM ag CROSS JOIN tt CROSS JOIN ch""".stripMargin

  /** Macro-averaged per-class F1 of the marker langid classifier — the
    * class-balanced member of the evaluation battery ([[cohensKappa]]
    * chance-corrects OVERALL agreement; macro-F1 weights every class
    * EQUALLY, so a classifier that ignores a minority language is
    * punished even when the corpus is 80% English — the number a
    * multilingual-curation pipeline reads before trusting a filter on
    * its tail languages). Per class: tp from the confusion diagonal,
    * fp/fn from FULL-OUTER row/column marginals (a label with no
    * predictions still scores F1 = 0 and drags the macro mean — the
    * kappa marginal lesson), F1‰ = 2000·tp div (2tp + fp + fn), all
    * integer. Output: one row per class + the macro mean as class
    * '~macro' (tilde sorts last in both engines' binary collation).
    *
    * Scale: rides the one langPreds corpus pass; everything after is
    * ≤|langs|²-row arithmetic.
    */
  def evalMacroF1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cm = langPreds(s, dir).groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n")).pin(true) // bounded |langs|² frame
    val rows = cm.groupBy($"lang").agg(sum($"n").as("r"))
    val cols = cm.groupBy($"pred_lang".as("lang")).agg(sum($"n").as("c"))
    val diag = cm.filter($"lang" === $"pred_lang")
      .select($"lang", $"n".as("tp"))
    val per = rows.join(cols, Seq("lang"), "full")
      .join(diag, Seq("lang"), "left")
      .select($"lang".as("class"),
        coalesce($"tp", lit(0L)).as("tp"),
        (coalesce($"c", lit(0L)) - coalesce($"tp", lit(0L))).as("fp"),
        (coalesce($"r", lit(0L)) - coalesce($"tp", lit(0L))).as("fn"))
      .select($"class", $"tp", $"fp", $"fn",
        expr("2000 * tp div greatest(2 * tp + fp + fn, 1)").as("f1_pm"))
      .pin(true) // the macro fold reads it too
    val macroRow = per.agg(count(lit(1)).as("k"), sum($"f1_pm").as("s"))
      .select(lit("~macro").as("class"), lit(0L).as("tp"),
        lit(0L).as("fp"), lit(0L).as("fn"),
        expr("s div k").as("f1_pm"))
    per.unionByName(macroRow).orderBy($"class")
  }

  /** Round count shared by [[evalBradleyTerry]] and its SQL oracle (the
    * graphHits/kmeansIters pattern: the generator and the loop can never
    * disagree on rounds).
    */
  val BtIters = 3

  /** Bradley–Terry pairwise-preference ranking (Bradley & Terry 1952;
    * the minorization-maximization fit of Hunter 2004) — the arena-style
    * eval: rank SYSTEMS from pairwise outcomes, the aggregation behind
    * LLM preference leaderboards. Here the "systems" are the corpus
    * languages and a match is an adjacent doc pair (even vs odd doc_id,
    * cross-language only), won by the doc with the larger distinct-token
    * count (lower doc_id on ties — fully deterministic); production
    * swaps in real model ids and judge verdicts, identical plan.
    *
    * MM update, all-integer ([[graphHits]]' rescale discipline): scores
    * start at S = 2²⁰; per round inv_i = Σ_j n_ij·S div (s_i + s_j),
    * raw_i = W_i·S div inv_i, then a 1-row max-divisor rescale keeps
    * magnitudes at S (floor(s_i) ≥ 1 so a winless system never zeroes a
    * denominator). Converges to the BT MLE ordering; [[BtIters]] rounds
    * pinned, oracle rounds generated from the same constant.
    *
    * Scale: ONE corpus pass (per-doc distinct-token fold + the pair
    * join, both doc/pair-keyed); everything after runs on the ≤|systems|²
    * game frame — the iteration cost is independent of corpus size, the
    * property that makes nightly arena refreshes O(new matches).
    */
  def evalBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = 1048576L // 2^20
    val nd = Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"lang")
      .agg(countDistinct($"w").as("nd"))
      .select(expr("doc_id div 2").as("pair"), ($"doc_id" % 2L).as("side"),
        $"lang", $"nd")
    val matches = nd.filter($"side" === 0L)
      .select($"pair", $"lang".as("l0"), $"nd".as("nd0"))
      .join(nd.filter($"side" === 1L)
        .select($"pair", $"lang".as("l1"), $"nd".as("nd1")), Seq("pair"))
      .filter($"l0" =!= $"l1")
      .select(when($"nd1" > $"nd0", $"l1").otherwise($"l0").as("winner"),
        when($"nd1" > $"nd0", $"l0").otherwise($"l1").as("loser"))
    val wl = matches.groupBy($"winner", $"loser")
      .agg(count(lit(1)).as("w")).pin(true) // games + wins + langs read it
    val games = wl.select($"winner".as("i"), $"loser".as("j"), $"w")
      .unionByName(wl.select($"loser".as("i"), $"winner".as("j"), $"w"))
      .groupBy($"i", $"j").agg(sum($"w").as("n")).pin(true)
    val wins = games.select($"i".as("lang")).distinct()
      .join(wl.groupBy($"winner".as("lang")).agg(sum($"w").as("wins")),
        Seq("lang"), "left")
      .select($"lang", coalesce($"wins", lit(0L)).as("wins")).pin(true)
    var sc = wins.select($"lang", lit(S).as("s"))
    for (_ <- 1 to BtIters) {
      // the score frame is ≤|systems| rows at ANY corpus size — broadcast
      // both sides of the game join (guide §3.1: Catalyst sees only an
      // unestimated checkpoint lineage and would sort-merge, shuffling the
      // game frame twice per round)
      val inv = games
        .join(broadcast(sc.select($"lang".as("i"), $"s".as("si"))), Seq("i"))
        .join(broadcast(sc.select($"lang".as("j"), $"s".as("sj"))), Seq("j"))
        .groupBy($"i".as("lang"))
        .agg(sum(expr(s"n * $S div (si + sj)")).as("inv"))
      // pin the PRE-rescale ≤|systems|-row frame: the max-divisor agg and
      // the rescale both read it (pinning the POST-rescale sc — the r16
      // shape — ran the whole inv join+agg twice per round), and the pin
      // still truncates lineage so the si/sj double reference next round
      // cannot duplicate upstream rounds exponentially
      val raw = wins.join(inv, Seq("lang"))
        .select($"lang", expr(s"wins * $S div greatest(inv, 1)").as("raw"))
        .pin(true)
      val d = raw.agg((expr(s"max(raw) div $S") + 1L).as("d"))
      sc = raw.crossJoin(broadcast(d))
        .select($"lang", greatest(expr("raw div d"), lit(1L)).as("s"))
    }
    val gtot = games.groupBy($"i".as("lang")).agg(sum($"n").as("games"))
    sc.join(wins, Seq("lang")).join(gtot, Seq("lang"))
      .select($"lang", $"wins", $"games", $"s".as("score"))
      .orderBy($"score".desc, $"lang")
  }

  lazy val evalBradleyTerrySql: String = {
    val S = 1048576L
    def round(k: Int): String =
      s""",
         |inv$k AS (
         |  SELECT g.i AS lang,
         |    sum(g.n * $S // (a.s + b.s))::BIGINT AS inv
         |  FROM g JOIN s${k - 1} a ON g.i = a.lang
         |         JOIN s${k - 1} b ON g.j = b.lang
         |  GROUP BY g.i),
         |raw$k AS (
         |  SELECT w.lang, (w.wins * $S // greatest(inv, 1))::BIGINT AS raw
         |  FROM wins w JOIN inv$k USING (lang)),
         |d$k AS (SELECT (max(raw) // $S + 1)::BIGINT AS d FROM raw$k),
         |s$k AS (
         |  SELECT lang, greatest(raw // d, 1)::BIGINT AS s
         |  FROM raw$k CROSS JOIN d$k)""".stripMargin
    """WITH tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |nd AS (
      |  SELECT doc_id // 2 AS pair, doc_id % 2 AS side, lang,
      |    count(DISTINCT w)::BIGINT AS nd
      |  FROM tok GROUP BY doc_id // 2, doc_id % 2, lang),
      |m AS (
      |  SELECT CASE WHEN b.nd > a.nd THEN b.lang ELSE a.lang END AS winner,
      |         CASE WHEN b.nd > a.nd THEN a.lang ELSE b.lang END AS loser
      |  FROM nd a JOIN nd b ON a.pair = b.pair
      |  WHERE a.side = 0 AND b.side = 1 AND a.lang <> b.lang),
      |wl AS MATERIALIZED (
      |  SELECT winner, loser, count(*)::BIGINT AS w
      |  FROM m GROUP BY winner, loser),
      |g AS MATERIALIZED (
      |  SELECT i, j, sum(w)::BIGINT AS n FROM (
      |    SELECT winner AS i, loser AS j, w FROM wl
      |    UNION ALL SELECT loser, winner, w FROM wl) z
      |  GROUP BY i, j),
      |wins AS MATERIALIZED (
      |  SELECT l.lang, coalesce(ww.wins, 0)::BIGINT AS wins
      |  FROM (SELECT DISTINCT i AS lang FROM g) l
      |  LEFT JOIN (SELECT winner AS lang, sum(w)::BIGINT AS wins
      |             FROM wl GROUP BY winner) ww USING (lang)),
      |s0 AS (SELECT lang, 1048576::BIGINT AS s FROM wins)"""
      .stripMargin +
      (1 to BtIters).map(round).mkString +
      s"""
         |SELECT s.lang, w.wins,
         |  (SELECT sum(n) FROM g WHERE g.i = s.lang)::BIGINT AS games,
         |  s.s AS score
         |FROM s$BtIters s JOIN wins w USING (lang)
         |ORDER BY score DESC, lang""".stripMargin
  }

  /** ROUGE-N overlap (Lin 2004, "ROUGE: A Package for Automatic
    * Evaluation of Summaries" — the clipped n-gram form): corpus-level
    * micro-averaged ROUGE-1/ROUGE-2 between paired documents (candidate
    * = even doc_id, reference = the following odd doc_id — the adjacent
    * pairing a summarization/paraphrase eval table ships as two aligned
    * columns). Per (pair, n-gram): clipped match = min(candidate count,
    * reference count); micro precision = Σmatch/Σcand-grams, recall =
    * Σmatch/Σref-grams, and micro-F1 collapses EXACTLY to 2Σm/(Σc+Σr),
    * so all three permilles are integer division — no float anywhere.
    * Unpaired trailing docs are excluded from totals (a candidate with
    * no reference can score nothing, and counting its grams would
    * silently deflate precision).
    *
    * Scale: grams are counted per (pair, n, gram) — pair-local keys, so
    * the count and the clipped join both shuffle on co-located keys and
    * map-side combine applies; the readout is a bounded 2-row fold.
    * Gram identity is the token STRING (exact, no hash folding) —
    * heavier keys than a code join but zero collision semantics, the
    * right trade for an EVAL metric.
    */
  def evalRougeN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arr = split($"text", " ")
    val base = Tables.documents(s, dir)
      .select($"doc_id", expr("doc_id div 2").as("pair"),
        ($"doc_id" % 2L).as("side"), arr.as("l"))
    val paired = base.groupBy($"pair")
      .agg(countDistinct($"side").as("ns")).filter($"ns" === 2L)
      .select($"pair")
    val docs = base.join(paired, Seq("pair"), "left_semi").pin(true)
    val uni = docs.select($"pair", $"side", lit(1L).as("n"),
      explode($"l").as("g"))
    val bi = docs.select($"pair", $"side", lit(2L).as("n"),
        explode(arrays_zip(
          slice($"l", lit(1), size($"l") - 1).as("a"),
          slice($"l", lit(2), size($"l") - 1).as("b"))).as("p"))
      .select($"pair", $"side", $"n",
        concat_ws(" ", $"p.a", $"p.b").as("g"))
    val cnt = uni.unionByName(bi)
      .groupBy($"pair", $"n", $"g", $"side")
      .agg(count(lit(1)).as("c")).pin(true) // matched + totals read it
    val matched = cnt.filter($"side" === 0L)
      .select($"pair", $"n", $"g", $"c".as("c0"))
      .join(cnt.filter($"side" === 1L)
        .select($"pair", $"n", $"g", $"c".as("c1")), Seq("pair", "n", "g"))
      .groupBy($"n").agg(sum(least($"c0", $"c1")).as("matched"))
    val totals = cnt.groupBy($"n")
      .agg(sum(when($"side" === 0L, $"c").otherwise(0L)).as("cand_total"),
        sum(when($"side" === 1L, $"c").otherwise(0L)).as("ref_total"))
    totals.join(matched, Seq("n"), "left")
      .select($"n", coalesce($"matched", lit(0L)).as("matched"),
        $"cand_total", $"ref_total")
      .select($"n", $"matched", $"cand_total", $"ref_total",
        expr("1000 * matched div cand_total").as("precision_pm"),
        expr("1000 * matched div ref_total").as("recall_pm"),
        expr("2000 * matched div (cand_total + ref_total)").as("f1_pm"))
      .orderBy($"n")
  }

  val evalRougeNSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 2 AS pair, doc_id % 2 AS side,
      |    string_split(text, ' ') AS l
      |  FROM documents),
      |pd AS (SELECT pair FROM d GROUP BY pair
      |       HAVING count(DISTINCT side) = 2),
      |ts AS (SELECT doc_id, pair, side, i.i AS pos, l[i.i] AS w
      |       FROM d JOIN pd USING (pair),
      |       LATERAL (SELECT unnest(range(1, len(d.l) + 1)) AS i) i),
      |gr AS (
      |  SELECT pair, side, 1::BIGINT AS n, w AS g FROM ts
      |  UNION ALL
      |  SELECT a.pair, a.side, 2::BIGINT AS n, a.w || ' ' || b.w
      |  FROM ts a JOIN ts b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |cnt AS (SELECT pair, n, g, side, count(*)::BIGINT AS c
      |        FROM gr GROUP BY 1, 2, 3, 4),
      |m AS (SELECT a.n, sum(least(a.c, b.c))::BIGINT AS matched
      |      FROM cnt a JOIN cnt b
      |        ON a.pair = b.pair AND a.n = b.n AND a.g = b.g
      |        AND a.side = 0 AND b.side = 1
      |      GROUP BY a.n),
      |tot AS (
      |  SELECT n,
      |    sum(CASE WHEN side = 0 THEN c ELSE 0 END)::BIGINT AS cand_total,
      |    sum(CASE WHEN side = 1 THEN c ELSE 0 END)::BIGINT AS ref_total
      |  FROM cnt GROUP BY n)
      |SELECT t.n, coalesce(m.matched, 0)::BIGINT AS matched,
      |  cand_total, ref_total,
      |  ((1000 * coalesce(m.matched, 0)) // cand_total)::BIGINT
      |    AS precision_pm,
      |  ((1000 * coalesce(m.matched, 0)) // ref_total)::BIGINT
      |    AS recall_pm,
      |  ((2000 * coalesce(m.matched, 0)) // (cand_total + ref_total))
      |    ::BIGINT AS f1_pm
      |FROM tot t LEFT JOIN m ON t.n = m.n
      |ORDER BY t.n""".stripMargin

  lazy val evalMacroF1Sql: String =
    s"""WITH p AS (${"\n"}$langIdSql),
       |cm AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
       |       FROM p GROUP BY 1, 2),
       |rws AS (SELECT lang, sum(n)::BIGINT AS r FROM cm GROUP BY lang),
       |cls AS (SELECT pred_lang AS lang, sum(n)::BIGINT AS c
       |        FROM cm GROUP BY 1),
       |dg AS (SELECT lang, n AS tp FROM cm WHERE lang = pred_lang),
       |per AS (
       |  SELECT m.lang AS class,
       |    coalesce(dg.tp, 0)::BIGINT AS tp,
       |    (coalesce(m.c, 0) - coalesce(dg.tp, 0))::BIGINT AS fp,
       |    (coalesce(m.r, 0) - coalesce(dg.tp, 0))::BIGINT AS fn
       |  FROM (SELECT lang, r, c FROM rws FULL OUTER JOIN cls USING (lang)) m
       |  LEFT JOIN dg USING (lang)),
       |per2 AS (
       |  SELECT class, tp, fp, fn,
       |    (2000 * tp // greatest(2 * tp + fp + fn, 1))::BIGINT AS f1_pm
       |  FROM per),
       |mac AS (
       |  SELECT '~macro' AS class, 0::BIGINT AS tp, 0::BIGINT AS fp,
       |    0::BIGINT AS fn, (sum(f1_pm) // count(*))::BIGINT AS f1_pm
       |  FROM per2)
       |SELECT * FROM per2 UNION ALL SELECT * FROM mac ORDER BY class"""
      .stripMargin

  // lazy: langIdSql is declared later in the object; a strict val here
  // would capture null at initialization order
  lazy val langIdConfusionSql: String =
    s"""WITH p AS (${"\n"}$langIdSql),
       |c AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
       |      FROM p GROUP BY 1, 2)
       |SELECT lang, pred_lang, n,
       |  ((n * 1000) // sum(n) OVER (PARTITION BY lang))::BIGINT AS permille
       |FROM c ORDER BY lang, pred_lang""".stripMargin

  val langIdSql: String = {
    def occ(m: String) =
      s"((length(' '||text||' ') - length(replace(' '||text||' ', '$m', ''))) / ${m.length})::BIGINT"
    s"""SELECT doc_id, lang,
       |  ${occ(" the ")} + ${occ(" a ")} AS s_en,
       |  ${occ(" der ")} + ${occ(" und ")} AS s_de,
       |  ${occ(" el ")} + ${occ(" los ")} AS s_es,
       |  ${occ(" le ")} + ${occ(" la ")} AS s_fr,
       |  CASE WHEN ${occ(" the ")} + ${occ(" a ")} >= ${occ(" der ")} + ${occ(" und ")}
       |         AND ${occ(" the ")} + ${occ(" a ")} >= ${occ(" el ")} + ${occ(" los ")}
       |         AND ${occ(" the ")} + ${occ(" a ")} >= ${occ(" le ")} + ${occ(" la ")} THEN 'en'
       |       WHEN ${occ(" der ")} + ${occ(" und ")} >= ${occ(" el ")} + ${occ(" los ")}
       |         AND ${occ(" der ")} + ${occ(" und ")} >= ${occ(" le ")} + ${occ(" la ")} THEN 'de'
       |       WHEN ${occ(" el ")} + ${occ(" los ")} >= ${occ(" le ")} + ${occ(" la ")} THEN 'es'
       |       ELSE 'fr' END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** LEARNED language classifier: char-trigram multinomial Naive Bayes
    * with add-one smoothing, trained on the corpus's own labels and
    * applied back to every document — the data-driven replacement for the
    * hand-picked marker heuristic ([[langId]]), in the Cavnar–Trenkle
    * n-gram-profile tradition. Likelihoods are the same libm-free integer
    * bits the LM scorers use: cost_l(g) = bitlength(⌊(N_l+V)/(cnt_l(g)+1)⌋)
    * (≈ −log₂ p(g|l)), a document's score per language is the sum of its
    * trigram costs (unseen trigrams pay the smoothed ceiling bits0_l =
    * bitlength(N_l+V)), prediction is the argmin with a deterministic
    * language tie-break — bit-identical cross-engine end to end.
    *
    * Scale shape: one (lang, gram) count aggregation (vocabulary-bounded)
    * trains the model; scoring expands the doc-gram stream by |langs|
    * broadcast rows and joins the LM on (lang, gram) — one shuffle keyed
    * by gram, map-side-combinable score sums, no driver collect.
    *
    * Accuracy trade, stated plainly: 1-bit likelihood quantization keeps
    * the classifier bit-reproducible cross-engine but coarsens the
    * ranking (float log-probs would separate better); on the synthetic
    * gate corpus, whose language signal is mostly the planted marker
    * words, the NB sits slightly below the marker heuristic (184 vs
    * 193 / 500 at sf0.001 — LangNbSpec). On natural text, where the
    * signal is spread over the whole trigram distribution, the learned
    * profile is the one that generalizes.
    */
  /** Char-trigram stream `(doc_id, lang, gram)`, one row per position
    * 1..L−2 of each document with ≥3 chars. O(L) per doc: the text is
    * split into its char array ONCE per row and each trigram is three
    * O(1) `element_at` reads inside a `transform` — never the
    * per-position `substring(text, i, 3)` walk, whose UTF8 position
    * lookup is O(i) and makes that shape O(L²) per doc (the same defect
    * class the [[cdcChunks]] boundary scan was rewritten out of, measured
    * 12.2→1.6 s there). Invisible at gate-corpus doc lengths, quadratic
    * on real web documents. Pure generator — no shuffle, no window.
    */
  private def charTrigrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter(length($"text") >= 3)
      .withColumn("cs", split($"text", ""))
      .select($"doc_id", $"lang",
        explode(transform(sequence(lit(1), length($"text") - 2),
          i => concat(element_at($"cs", i), element_at($"cs", i + 1),
            element_at($"cs", i + 2)))).as("gram"))
  }

  /** The (doc_id, cand, score) NB scoring frame shared by [[langNb]]
    * (argmin) and [[langIdMargin]] (top-2 margin).
    */
  private def nbScores(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT checkpointed: both consumers re-run the O(L) trigram generator
    // off the parquet scan — regenerating 3-char rows is cheaper than
    // materializing the full gram stream (measured: dropping the eager
    // localCheckpoint plus the two shuffle removals below took the query
    // 4.7 s → well under 2 s at sf0.1)
    val grams = charTrigrams(s, dir)
    val lm = grams.groupBy($"lang", $"gram").agg(count(lit(1)).as("cnt"))
      .pin(true) // totals, vocab, and the scoring join
    val vocabF = lm.select($"gram").distinct().agg(count(lit(1)).as("v"))
    val totals = lm.groupBy($"lang").agg(sum($"cnt").as("nl"))
      .crossJoin(broadcast(vocabF))
      .pin(true) // |langs| rows; feeds lgs + lmBits
    val langs = totals.select($"lang".as("cand"),
      length(bin($"nl" + $"v")).cast("long").as("bits0"))
    // score_l(doc) = n_grams·bits0_l + Σ_{(l,g) seen} (bits_l(g) − bits0_l):
    // the unseen-ceiling term factors out, so the gram stream joins the LM
    // on gram ALONE — matched rows per gram = only the languages that
    // contain it, instead of an unconditional ×|langs| expansion. On a
    // real multilingual corpus (mostly language-private vocabulary) that
    // is a ~|langs|× row reduction; the join-side row bound, not the
    // constant, is what this shape buys at scale. The LM side is
    // |langs|×|trigram vocab| — VOCABULARY-bounded, not corpus-bounded —
    // so it broadcasts and the corpus-sized gram stream is never
    // shuffled for the join; the only gram-stream shuffle left is the
    // map-side-combined (doc_id, cand) score sum.
    val lmDelta = lm
      .join(broadcast(totals.select($"lang", $"nl", $"v")), Seq("lang"))
      .select($"lang".as("cand"), $"gram",
        (length(bin(floor(($"nl" + $"v") / ($"cnt" + 1L)).cast("long")))
          .cast("long") - length(bin($"nl" + $"v")).cast("long"))
          .as("delta"))
    val deltas = grams.select($"doc_id", $"gram")
      .join(broadcast(lmDelta), Seq("gram"))
      .groupBy($"doc_id", $"cand").agg(sum($"delta").as("dl"))
    // n_grams per doc is length(text) − 2 by construction — read it off
    // the table instead of re-aggregating the corpus-sized gram stream
    val scored = Tables.documents(s, dir)
      .filter(length($"text") >= 3)
      .select($"doc_id", (length($"text") - 2).cast("long").as("ng"))
      .crossJoin(broadcast(langs))
      .join(deltas, Seq("doc_id", "cand"), "left")
      .select($"doc_id", $"cand",
        ($"ng" * $"bits0" + coalesce($"dl", lit(0L))).as("score"))
    scored
  }

  def langNb(s: SparkSession, dir: String): DataFrame =
    nbPreds(s, dir).orderBy(col("doc_id"))

  /** Unsorted NB prediction frame — shared by [[langNb]] (adds the
    * presentation sort) and [[mcnemar]] (aggregates immediately).
    */
  private def nbPreds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // argmin with deterministic tie-break = lexicographic min over the
    // (score, cand) struct — a MERGEABLE aggregate (map-side combinable),
    // not a per-doc window sort; at scale the per-partition partial mins
    // shrink the exchange to one row per (partition, doc)
    val pred = nbScores(s, dir)
      .groupBy($"doc_id")
      .agg(min(struct($"score", $"cand")).as("b"))
      .select($"doc_id", $"b.cand".as("pred_lang"), $"b.score".as("score"))
    Tables.documents(s, dir).select($"doc_id", $"lang")
      .join(pred, Seq("doc_id"))
      .select($"doc_id", $"lang", $"pred_lang", $"score",
        ($"lang" === $"pred_lang").cast("int").as("correct"))
  }

  /** McNemar's test (1947) comparing the two shipped language
    * classifiers — the marker heuristic ([[langId]]) vs the n-gram NB
    * ([[langNb]]) — on their PAIRED per-document outcomes: only the
    * discordant cells matter (b = marker-only correct, c = NB-only
    * correct), χ² = (b−c)²/(b+c). This is the statistically right way
    * to compare two classifiers evaluated on the SAME documents
    * (accuracy deltas ignore pairing; McNemar is the Dietterich 1998
    * recommendation). Exact integers until the single final division.
    *
    * Scale: the two prediction passes the classifiers already cost,
    * one doc-keyed join, one 4-counter fold.
    */
  def mcnemar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = langPreds(s, dir)
      .select($"doc_id", ($"lang" === $"pred_lang").as("c1"))
    val nb = nbPreds(s, dir).select($"doc_id", ($"correct" === 1).as("c2"))
    m.join(nb, Seq("doc_id"))
      .agg(
        sum(when($"c1" && $"c2", 1L).otherwise(0L)).as("both_correct"),
        sum(when($"c1" && !$"c2", 1L).otherwise(0L)).as("only_marker"),
        sum(when(!$"c1" && $"c2", 1L).otherwise(0L)).as("only_nb"),
        sum(when(!$"c1" && !$"c2", 1L).otherwise(0L)).as("both_wrong"))
      .select($"both_correct", $"only_marker", $"only_nb", $"both_wrong",
        round((($"only_marker" - $"only_nb")
          * ($"only_marker" - $"only_nb")).cast("double")
          / greatest($"only_marker" + $"only_nb", lit(1L)), 4)
          .as("mcnemar_chi2"))
  }

  lazy val mcnemarSql: String =
    s"""WITH p1 AS (${"\n"}$langIdSql),
       |p2 AS (${"\n"}$langNbSql),
       |j AS (
       |  SELECT p1.lang = p1.pred_lang AS c1, p2.correct = 1 AS c2
       |  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id),
       |ag AS (SELECT
       |  sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END)::BIGINT AS a,
       |  sum(CASE WHEN c1 AND NOT c2 THEN 1 ELSE 0 END)::BIGINT AS b,
       |  sum(CASE WHEN NOT c1 AND c2 THEN 1 ELSE 0 END)::BIGINT AS c,
       |  sum(CASE WHEN NOT c1 AND NOT c2 THEN 1 ELSE 0 END)::BIGINT AS d
       |  FROM j)
       |SELECT a AS both_correct, b AS only_marker, c AS only_nb,
       |  d AS both_wrong,
       |  round(((b - c) * (b - c))::DOUBLE / greatest(b + c, 1), 4)
       |    AS mcnemar_chi2
       |FROM ag""".stripMargin

  val langNbSql: String =
    """WITH g AS (
      |  SELECT doc_id, lang, substr(text, i::INT, 3) AS gram
      |  FROM (SELECT doc_id, lang, text, unnest(range(1, length(text) - 1)) AS i
      |        FROM documents WHERE length(text) >= 3) x),
      |lm AS (SELECT lang, gram, count(*)::BIGINT AS cnt FROM g GROUP BY 1, 2),
      |vc AS (SELECT count(DISTINCT gram)::BIGINT AS v FROM lm),
      |tot AS (SELECT lang, sum(cnt)::BIGINT AS nl FROM lm GROUP BY lang),
      |lgs AS (SELECT lang AS cand, length(bin(nl + v))::BIGINT AS bits0
      |        FROM tot CROSS JOIN vc),
      |lb AS (SELECT lm.lang AS cand, lm.gram,
      |         length(bin((t.nl + vc.v) // (lm.cnt + 1)))::BIGINT AS bits
      |       FROM lm JOIN tot t ON lm.lang = t.lang CROSS JOIN vc),
      |sc AS (
      |  SELECT dg.doc_id, l.cand,
      |    sum(coalesce(lb.bits, l.bits0))::BIGINT AS score
      |  FROM (SELECT doc_id, gram FROM g) dg
      |  CROSS JOIN lgs l
      |  LEFT JOIN lb ON lb.cand = l.cand AND lb.gram = dg.gram
      |  GROUP BY 1, 2),
      |pr AS (
      |  SELECT doc_id, cand AS pred_lang, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score, cand) AS rn
      |  FROM sc)
      |SELECT d.doc_id, d.lang, p.pred_lang, p.score,
      |  CASE WHEN d.lang = p.pred_lang THEN 1 ELSE 0 END AS correct
      |FROM documents d JOIN pr p ON d.doc_id = p.doc_id AND p.rn = 1
      |ORDER BY d.doc_id""".stripMargin

  /** Classifier CONFIDENCE margin: per doc, the NB score gap (integer
    * bits) between the best and second-best language — the number a
    * routing pipeline thresholds on ("margin < τ → route to the heavier
    * classifier / drop the doc"), and the quantity reliability plots bin
    * by. Margin 0 = the classifier genuinely can't tell (tie).
    *
    * Scale: the same [[nbScores]] frame as [[langNb]] (shared shape, no
    * extra corpus pass beyond the scoring join); top-2 per doc via a
    * rank window bounded at 2 — the GroupedTopK rewrite picks this up
    * under the production session, so per-doc state is two rows, not a
    * |langs|-row sort buffer.
    */
  def langIdMargin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // top-2 via ONE aggregation over the ≤|langs| per-doc candidate rows:
    // sort_array(collect_list(...)) keeps the agg a single shuffle on
    // doc_id (a rank window here measured 4.6 s vs 1.9 s for this form at
    // sf0.1 — the window's per-partition sort pays for the whole frame,
    // the collect only for |langs|-sized groups)
    nbScores(s, dir)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"score", $"cand"))).as("a"))
      .select($"doc_id", $"a" (0)("cand").as("pred_lang"),
        ($"a" (1)("score") - $"a" (0)("score")).as("margin_bits"))
      .orderBy($"doc_id")
  }

  lazy val langIdMarginSql: String = {
    // same CTE chain as langNbSql up to the ranked per-doc scores
    val base = langNbSql.substring(0, langNbSql.indexOf("SELECT d.doc_id"))
    base +
      """,m1 AS (SELECT doc_id, pred_lang, score FROM pr WHERE rn = 1),
        |m2 AS (SELECT doc_id, score FROM pr WHERE rn = 2)
        |SELECT m1.doc_id, m1.pred_lang,
        |  (m2.score - m1.score)::BIGINT AS margin_bits
        |FROM m1 JOIN m2 ON m1.doc_id = m2.doc_id
        |ORDER BY m1.doc_id""".stripMargin
  }

  /** Document fingerprint: polynomial rolling hash over all chars,
    * (acc*31 + ascii(c)) mod 1e9+7, init 7 — a real content fingerprint
    * with exact integer parity (Spark `aggregate` ≡ DuckDB `list_reduce`).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        aggregate(split($"text", ""), lit(7L),
          (acc, c) => (acc * 31L + ascii(c)) % 1000000007L).as("fp"))
      .orderBy($"doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(7::BIGINT,
      |      [ascii(c)::BIGINT FOR c IN string_split(text, '')]),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword ratio, mean word length, length band — the
    * standard cheap pre-filters of a training-data pipeline, all in exact
    * arithmetic. `keep` is the composite filter verdict.
    */
  def quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = concat(lit(" "), $"text", lit(" "))
    def occ(m: String): Column =
      ((length(p) - length(regexp_replace(p, lit(m), lit("")))) / m.length)
        .cast("long")
    val nWords =
      (length($"text") - length(regexp_replace($"text", lit(" "), lit(""))) + 1)
        .cast("long")
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        nWords.as("n_words"),
        (occ(" the ") + occ(" a ") + occ(" of ")).as("stop_hits"))
      .withColumn("stop_ratio",
        round($"stop_hits".cast("double") / $"n_words", 4))
      .withColumn("mean_wlen",
        round(($"n_chars" - $"n_words" + 1).cast("double") / $"n_words", 3))
      .withColumn("keep",
        ($"n_words" >= 15 && $"mean_wlen" >= 2.0 && $"mean_wlen" <= 12.0)
          .cast("int"))
      .orderBy($"doc_id")
  }

  val qualitySql: String = {
    def occ(m: String) =
      s"((length(' '||text||' ') - length(replace(' '||text||' ', '$m', ''))) / ${m.length})::BIGINT"
    val nw = "(length(text) - length(replace(text,' ','')) + 1)::BIGINT"
    s"""SELECT doc_id, n_chars, $nw AS n_words,
       |  ${occ(" the ")} + ${occ(" a ")} + ${occ(" of ")} AS stop_hits,
       |  round((${occ(" the ")} + ${occ(" a ")} + ${occ(" of ")}) * 1.0 / $nw, 4)
       |    AS stop_ratio,
       |  round((n_chars - $nw + 1) * 1.0 / $nw, 3) AS mean_wlen,
       |  CASE WHEN $nw >= 15
       |         AND round((n_chars - $nw + 1) * 1.0 / $nw, 3) >= 2.0
       |         AND round((n_chars - $nw + 1) * 1.0 / $nw, 3) <= 12.0
       |       THEN 1 ELSE 0 END AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Repetition-based quality signals (the Gopher/Rae et al. repetition
    * rules, reduced to exact arithmetic): per doc, the duplicate-word
    * fraction (1 − distinct/total) and the most-frequent-word fraction.
    * A high score on either marks boilerplate/spam for removal before
    * training. One explode + two map-side-combinable aggregations — the
    * same inverted-index shuffle shape as [[textStats]], so the 100 TB
    * plan is one pass over the corpus with no join. Thresholds (0.55 /
    * 0.12) are calibrated to split this corpus near its median; the
    * `keep` verdict compares the ROUNDED fractions so both engines gate
    * on bit-identical values.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wc = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    wc.groupBy($"doc_id")
      .agg(sum($"c").as("n_words"), count(lit(1)).as("n_distinct"),
        max($"c").as("top_count"))
      .select($"doc_id", $"n_words", $"n_distinct",
        round(lit(1.0) - $"n_distinct".cast("double") / $"n_words", 4)
          .as("dup_frac"),
        round($"top_count".cast("double") / $"n_words", 4).as("top_frac"))
      .withColumn("keep",
        ($"dup_frac" <= 0.55 && $"top_frac" <= 0.12).cast("int"))
      .orderBy($"doc_id")
  }

  val repetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM w GROUP BY doc_id, w),
      |agg AS (
      |  SELECT doc_id, sum(c)::BIGINT AS n_words, count(*)::BIGINT AS n_distinct,
      |         max(c)::BIGINT AS top_count
      |  FROM wc GROUP BY doc_id)
      |SELECT doc_id, n_words, n_distinct,
      |  round(1.0::DOUBLE - n_distinct::DOUBLE / n_words, 4) AS dup_frac,
      |  round(top_count::DOUBLE / n_words, 4) AS top_frac,
      |  CASE WHEN round(1.0::DOUBLE - n_distinct::DOUBLE / n_words, 4) <= 0.55
      |        AND round(top_count::DOUBLE / n_words, 4) <= 0.12
      |       THEN 1 ELSE 0 END AS keep
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Gopher-style quality rule battery (Rae et al. 2021, §A1.1), reduced
    * to exact arithmetic: per doc the five standard pretraining filters —
    * word count in [50, 100k], mean word length in [3, 10], symbol-to-word
    * ratio ('#' and '...') ≤ 0.1, ≥ 80% of words containing an alphabetic
    * character, and distinct stopwords present — each as its own rule
    * bit plus the composite `keep`. (Gopher's stopword rule is ≥ 2 of a
    * larger list; this synthetic word-soup corpus carries at most one of
    * the markers per doc, so the rule is calibrated to ≥ 1 — the point
    * is the rule-battery shape and the exact cross-engine arithmetic.) Distinct from [[quality]] (a score)
    * and [[repetition]] (dup-fraction rules): this is the rule-battery
    * shape where each filter is auditable independently, which is how
    * production pipelines report per-rule removal counts.
    *
    * Scale: ONE explode + ONE groupBy(doc_id) aggregation — no join, every
    * aggregate map-side combinable (the stopword count-distinct has an
    * 8-value domain). All fractions are rounded before the rule compare so
    * both engines gate on bit-identical values.
    */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gopherRulesOf(s, dir).orderBy($"doc_id")
  }

  /** Unsorted rule frame shared by [[gopherRules]] (adds the presentation
    * sort) and [[keepManifest]] (joins immediately — a sort here would be
    * a wasted exchange under the join).
    */
  private def gopherRulesOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    // literal (non-regex) occurrence count of `m` inside one word, exact:
    // each hit removes exactly m.length chars, so the division is integral
    def litOcc(c: Column, m: String): Column =
      ((length(c) - length(replace(c, lit(m), lit("")))) / m.length)
        .cast("long")
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length($"w").cast("long")).as("sum_wlen"),
        sum((lower($"w") =!= upper($"w")).cast("long")).as("alpha_words"),
        count_distinct(when($"w".isin(stops: _*), $"w")).as("stop_distinct"),
        sum(litOcc($"w", "#") + litOcc($"w", "...")).as("sym_hits"))
      .select($"doc_id", $"n_words",
        round($"sum_wlen".cast("double") / $"n_words", 3).as("mean_wlen"),
        round($"alpha_words".cast("double") / $"n_words", 4).as("alpha_frac"),
        round($"sym_hits".cast("double") / $"n_words", 4).as("sym_frac"),
        $"stop_distinct")
      .withColumn("r_words",
        ($"n_words" >= 50L && $"n_words" <= 100000L).cast("int"))
      .withColumn("r_wlen",
        ($"mean_wlen" >= 3.0 && $"mean_wlen" <= 10.0).cast("int"))
      .withColumn("r_alpha", ($"alpha_frac" >= 0.8).cast("int"))
      .withColumn("r_sym", ($"sym_frac" <= 0.1).cast("int"))
      .withColumn("r_stop", ($"stop_distinct" >= 1L).cast("int"))
      .withColumn("keep",
        ($"r_words" * $"r_wlen" * $"r_alpha" * $"r_sym" * $"r_stop").cast("int"))
  }

  val gopherRulesSql: String = {
    val stopList = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s"'$w'").mkString(", ")
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |agg AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_words,
      |    sum(length(w))::BIGINT AS sum_wlen,
      |    sum(CASE WHEN lower(w) <> upper(w) THEN 1 ELSE 0 END)::BIGINT
      |      AS alpha_words,
      |    count(DISTINCT CASE WHEN w IN (STOPS) THEN w END)::BIGINT
      |      AS stop_distinct,
      |    sum(((length(w) - length(replace(w, '#', '')))
      |       + (length(w) - length(replace(w, '...', ''))) // 3)::BIGINT)::BIGINT
      |      AS sym_hits
      |  FROM w GROUP BY doc_id),
      |m AS (
      |  SELECT doc_id, n_words,
      |    round(sum_wlen * 1.0 / n_words, 3) AS mean_wlen,
      |    round(alpha_words * 1.0 / n_words, 4) AS alpha_frac,
      |    round(sym_hits * 1.0 / n_words, 4) AS sym_frac,
      |    stop_distinct
      |  FROM agg)
      |SELECT doc_id, n_words, mean_wlen, alpha_frac, sym_frac, stop_distinct,
      |  (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)::INT AS r_words,
      |  (CASE WHEN mean_wlen BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)::INT AS r_wlen,
      |  (CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END)::INT AS r_alpha,
      |  (CASE WHEN sym_frac <= 0.1 THEN 1 ELSE 0 END)::INT AS r_sym,
      |  (CASE WHEN stop_distinct >= 1 THEN 1 ELSE 0 END)::INT AS r_stop,
      |  ((CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
      |   * (CASE WHEN mean_wlen BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)
      |   * (CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END)
      |   * (CASE WHEN sym_frac <= 0.1 THEN 1 ELSE 0 END)
      |   * (CASE WHEN stop_distinct >= 1 THEN 1 ELSE 0 END))::INT AS keep
      |FROM m ORDER BY doc_id""".stripMargin.replace("STOPS", stopList)
  }

  // ---- deduplication ----

  /** Exact dedup: group identical texts (by content, with an md5 witness),
    * keep the smallest doc_id. The 100 TB shape: shuffle on the hash, not
    * the text.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", md5($"text".cast("binary")).as("h"))
      .orderBy($"keep_id")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS h
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** MinHash signatures: 8 permutations (a_j*code + b_j) mod P over the
    * distinct token set. Signature equality ≈ Jaccard similarity — the
    * sketch behind LSH dedup.
    */
  def minhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    minhashOf(s, dir).orderBy($"doc_id")
  }

  /** Unsorted signature frame shared by [[minhash]] and [[minhashPairs]]
    * (the public query adds the presentation sort).
    */
  private def minhashOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val codes = tokens(s, dir).select($"doc_id", tokenCode($"w").as("code"))
    val aggs = A.indices.map(j =>
      min((lit(A(j)) * $"code" + B(j)) % P).as(s"mh$j"))
    codes.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
  }

  val minhashSql: String = tokCte + {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(",\n  ")
    s"""SELECT doc_id,
       |  $cols
       |FROM codes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** MinHash-LSH candidate pairs: 2 bands × 4 rows (S-curve threshold
    * (1/b)^(1/r) ≈ 0.71); docs sharing any band signature are candidates.
    * Band signatures fold the 4 minhashes with an overflow-safe modular
    * polynomial (M ≈ 2^36 keeps every intermediate < 2^53). This is the
    * scale path for near-dedup: the join key is (band, signature), so work
    * is proportional to bucket sizes, never O(n²). (This corpus is built
    * with heavy near-duplication — p50 token-Jaccard 0.63 — so large
    * candidate sets are the correct output, not a config artifact.)
    */
  private val M = 68719476731L // prime ≈ 2^36

  private def bandSig(cols: Seq[Column]): Column =
    cols.reduce((acc, c) => (acc % M * 131071L + c) % M)

  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    minhashCandidates(s, dir).orderBy($"a", $"b")
  }

  /** The unsorted minhash-LSH candidate pair set (a < b, each pair once —
    * first-matching-band). Shared by [[minhashPairs]] (which adds the
    * presentation sort) and graph consumers ([[pageRank]]) that re-shuffle
    * immediately and must not pay a wasted global exchange.
    */
  private def minhashCandidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // checkpoint the per-doc signatures: the band union references the
    // frame twice and the self-join doubles each side again, so without a
    // materialization the tokenize+explode+8-way-min pipeline over the
    // corpus runs FOUR times (measured: the whole-plan explain showed 4
    // parquet scans). The signature frame is n_docs × 9 longs — the cheap
    // thing to hold; the corpus pass is the expensive thing to repeat.
    //
    // FIRST-MATCHING-BAND emission: a pair agreeing in several bands is
    // emitted only from its lowest matching band (later bands carry the
    // band-0 signature and filter on its inequality), so the candidate
    // set needs NO distinct — at 10× scale that distinct was a 48M-row
    // exchange+dedup and the emitters' dominant cost; the filter rides
    // the join itself.
    val sig = minhashOf(s, dir).pin(true)
    val bands = bandedOf(sig)
    val l = bands.select($"doc_id".as("a"), $"sig0".as("s0a"), $"band", $"sig")
    val r = bands.select($"doc_id".as("b"), $"sig0".as("s0b"), $"band", $"sig")
    l.join(r, Seq("band", "sig"))
      .filter($"a" < $"b" && ($"band" === 0 || $"s0a" =!= $"s0b"))
      .select($"a", $"b")
  }

  /** The 8 MinHash signature columns as pure PER-ROW array expressions
    * over a `text` column: array_min over the permuted codes of the
    * distinct token set. Bit-identical to the groupBy-min the batch
    * operators use (same distinct set, same permutations — asserted in
    * DedupStreamSpec), but STATELESS, which is what a streaming ingest
    * path needs: an append-mode stream cannot emit groupBy aggregates
    * without watermark expiry, while a map-only signature goes straight
    * into a stream-static index join ([[graft.streaming.DedupStream]]).
    */
  private[graft] def minhashSigCols: Seq[Column] = {
    val codes = transform(array_distinct(split(col("text"), " ")),
      w => tokenCode(w))
    A.indices.map(j =>
      array_min(transform(codes, c => (lit(A(j)) * c + B(j)) % P))
        .as(s"mh$j"))
  }

  /** (doc_id, sig0, band, sig) band-exploded view of an 8-column minhash
    * signature frame — 2 bands × 4 rows folded by [[bandSig]]. sig0 rides
    * along for first-matching-band dedup at the join. `carry` names extra
    * input columns to thread through unchanged (the streaming self-join
    * carries its event-time column this way).
    */
  private[graft] def bandedOf(sig: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val carried = carry.map(col)
    sig.select(Seq($"doc_id",
        bandSig((0 until 4).map(i => col(s"mh$i"))).as("sig0"),
        bandSig((4 until 8).map(i => col(s"mh$i"))).as("sig1")) ++ carried: _*)
      .select(Seq($"doc_id", $"sig0", explode(array(
        struct(lit(0).as("band"), $"sig0".as("sig")),
        struct(lit(1).as("band"), $"sig1".as("sig")))).as("e")) ++ carried: _*)
      .select(Seq($"doc_id", $"sig0", $"e.band", $"e.sig") ++ carried: _*)
  }

  /** Incremental (delta-vs-corpus) near-dup candidates: every new-batch doc
    * paired with the indexed-corpus docs it collides with, plus collisions
    * inside the batch itself. This is the PRODUCTION dedup shape at 100 TB:
    * the corpus side joins from its PERSISTED signature table (n_docs × 9
    * longs — ~3 orders of magnitude smaller than the text it sketches, see
    * IncrementalDedupSpec's VersionedTable round-trip), so a daily delta
    * re-sketches only itself and never re-reads the corpus text. The banded
    * join is the same first-matching-band equi-join as [[minhashPairs]];
    * corpus→delta pairs take no id-order constraint (roles disambiguate),
    * delta→delta pairs dedup on a < b. The explicit a ≠ b guard makes the
    * helper safe even when the corpus and delta frames share doc_ids (a
    * re-submitted doc would otherwise emit a corpus-side self-pair); the
    * gate query's mod-5 split never exercises that case, so the guard is
    * the only thing enforcing the contract for external callers.
    */
  def incrementalPairsOf(corpusSig: DataFrame, deltaSig: DataFrame): DataFrame = {
    val s = corpusSig.sparkSession
    import s.implicits._
    val l = bandedOf(corpusSig).withColumn("a_new", lit(false))
      .unionByName(bandedOf(deltaSig).withColumn("a_new", lit(true)))
      .select($"doc_id".as("a"), $"sig0".as("s0a"), $"a_new", $"band", $"sig")
    val r = bandedOf(deltaSig)
      .select($"doc_id".as("b"), $"sig0".as("s0b"), $"band", $"sig")
    l.join(r, Seq("band", "sig"))
      .filter($"a" =!= $"b" && (!$"a_new" || $"a" < $"b") &&
        ($"band" === 0 || $"s0a" =!= $"s0b"))
      .select($"b".as("new_id"), $"a".as("match_id"),
        when($"a_new", "delta").otherwise("corpus").as("match_src"))
  }

  /** The oracle-gated incremental-dedup query: docs with doc_id ≡ 4 (mod 5)
    * are the "new batch" (20%, interleaved — scale-free and deterministic),
    * the rest are the indexed corpus. One signature pass over the corpus
    * feeds both roles (the split filters read the checkpointed frame).
    */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = minhashOf(s, dir).pin(true)
    val isNew = $"doc_id" % 5 === 4
    incrementalPairsOf(sig.filter(!isNew), sig.filter(isNew))
      .orderBy($"new_id", $"match_id")
  }

  val incrementalDedupSql: String = tokCte + {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(", ")
    def sig(i: Int) =
      (1 until 4).foldLeft(s"mh${i}")((acc, j) =>
        s"(($acc) % $M * 131071 + mh${i + j}) % $M")
    s""", sigs AS (SELECT doc_id, $cols FROM codes GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${sig(0)} AS sig FROM sigs
       |  UNION ALL SELECT doc_id, 1, ${sig(4)} FROM sigs),
       |pairs AS (
       |  SELECT DISTINCT r.doc_id AS new_id, l.doc_id AS match_id
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig
       |  WHERE r.doc_id % 5 = 4
       |    AND (l.doc_id % 5 <> 4 OR l.doc_id < r.doc_id))
       |SELECT new_id, match_id,
       |  CASE WHEN match_id % 5 = 4 THEN 'delta' ELSE 'corpus' END
       |    AS match_src
       |FROM pairs ORDER BY new_id, match_id""".stripMargin
  }

  /** tokCte + sigs/bands + a distinct `pairs` CTE — the minhash candidate
    * set as a reusable prefix (pairs ≡ the Spark first-matching-band
    * emission, which is distinct by construction).
    */
  private val minhashPairsCte: String = tokCte + {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(", ")
    def sig(i: Int) =
      (1 until 4).foldLeft(s"mh${i}")((acc, j) =>
        s"(($acc) % $M * 131071 + mh${i + j}) % $M")
    s""", sigs AS (SELECT doc_id, $cols FROM codes GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${sig(0)} AS sig FROM sigs
       |  UNION ALL SELECT doc_id, 1, ${sig(4)} FROM sigs),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id)""".stripMargin
  }

  val minhashPairsSql: String =
    minhashPairsCte + "\nSELECT a, b FROM pairs ORDER BY a, b"

  /** Exact token-set Jaccard pairs at threshold 0.95.
    *
    * Candidate generation uses DELETION-NEIGHBORHOOD signatures instead of
    * the naive inverted-index join (which explodes to Σ bucket² ≈ 200M rows
    * on this corpus at sf0.1): with token sets of size n ≤ 31,
    * J(A,B) ≥ 0.95 ⟹ |A Δ B| ≤ 1 (c/(c+2) ≥ 0.95 needs c ≥ 38 > 31), so
    * every qualifying pair has equal sets or differs by one token. Each doc
    * emits an additive set hash H = Σ h(w) (exact long, no overflow:
    * ≤ 31·2^36) plus n delete-one hashes H − h(w); qualifying pairs always
    * collide on a signature, and candidates are verified EXACTLY via
    * array_intersect — hash collisions only cost verification work, never
    * correctness. Near-linear: |sigs| = Σ(n+1), buckets ≈ true-pair sized.
    * (For thresholds where |AΔB| is unbounded, prefix filtering is the
    * standard fallback; MinHash-LSH above is the approximate path.)
    */
  /** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge,
    * SIGMOD 1995) — the OTHER classic candidate-generation family next
    * to LSH banding: sort the corpus by a cheap blocking key, slide a
    * fixed window of `SnmWindow` positions over the sorted order, and
    * verify only pairs that fall inside some window. Two passes with
    * complementary keys (the published multi-pass form): the document's
    * first 4 words and its last 4 words — a near-dup that edits one end
    * of the template still sorts adjacent under the other key. Verified
    * pairs carry exact DISTINCT-word Jaccard ≥ 0.9.
    *
    * vs LSH: banding's candidate volume tracks signature collision
    * probability (tunable but data-dependent — a hot band is a skewed
    * key); SNM's is EXACTLY (w−1)·N by construction, whatever the data,
    * and the blocking key needs no hashing theory. The price is recall
    * only within sort locality — which is why production stacks run both
    * and union candidates (this operator + `dedup_minhash_pairs`).
    *
    * Scale: each pass is one range-partitioned sort + [[GlobalOrder]]
    * exact rank (no single-reducer window; the offset table is one row
    * per partition), then a rank-keyed equi-join pairing rank r with
    * r+1..r+w−1 — keyed shuffles only, candidate fan bounded by w·N.
    * Verification touches candidates only.
    */
  def sortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val words = docs
      .select($"doc_id", explode(split($"text", " ")).as("w")).distinct()
      .pin(true) // verification joins (both sides)
    val perDoc = words.groupBy($"doc_id")
      .agg(sort_array(collect_set($"w")).as("arr"),
        count(lit(1)).as("n"))
      .pin(true)
    def pass(key: Column): DataFrame = {
      val keyed = docs.select($"doc_id", key.as("bkey"))
      val (ranked, _) = GlobalOrder.rank(keyed,
        Seq(col("bkey"), col("doc_id")), "rnk")
      ranked.select($"doc_id".as("x"), $"rnk")
        .withColumn("d", explode(sequence(lit(1), lit(SnmWindow - 1))))
        .withColumn("rnk2", $"rnk" + $"d")
        .join(ranked.select($"doc_id".as("y"), $"rnk".as("rnk2")),
          Seq("rnk2"))
        .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
    }
    val sp = split($"text", " ")
    // tail key via positive indices (greatest(1, n-3), length 4) so short
    // documents resolve identically here and in DuckDB's list_slice
    val cand = pass(array_join(slice(sp, 1, 4), " "))
      .unionByName(pass(array_join(
        slice(sp, greatest(lit(1), size(sp) - 3), lit(4)), " ")))
      .distinct()
    cand
      .join(perDoc.select($"doc_id".as("a"), $"arr".as("aa"), $"n".as("na")),
        Seq("a"))
      .join(perDoc.select($"doc_id".as("b"), $"arr".as("ab"), $"n".as("nb")),
        Seq("b"))
      .withColumn("c", size(array_intersect($"aa", $"ab")).cast("long"))
      .withColumn("jaccard",
        round($"c".cast("double") / ($"na" + $"nb" - $"c"), 4))
      .filter($"c".cast("double") / ($"na" + $"nb" - $"c") >= 0.9)
      .select($"a", $"b", $"jaccard")
      .orderBy($"a", $"b")
  }

  /** Window width of [[sortedNeighborhood]] (positions, not pairs). */
  private val SnmWindow = 8

  val sortedNeighborhoodSql: String = {
    def passSql(tag: String, keyExpr: String): String =
      s"""rk$tag AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY $keyExpr, doc_id)
         |    AS rnk
         |  FROM documents),
         |cd$tag AS (
         |  SELECT least(x.doc_id, y.doc_id) AS a,
         |         greatest(x.doc_id, y.doc_id) AS b
         |  FROM rk$tag x JOIN rk$tag y
         |    ON y.rnk > x.rnk AND y.rnk <= x.rnk + ${SnmWindow - 1})"""
        .stripMargin
    s"""WITH words AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |sz AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
       |${passSql("h", "array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')")},
       |${passSql("t", "array_to_string(list_slice(string_split(text, ' '), greatest(1, len(string_split(text, ' ')) - 3), len(string_split(text, ' '))), ' ')")},
       |cand AS (SELECT a, b FROM cdh UNION SELECT a, b FROM cdt),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS c
       |  FROM cand c
       |  JOIN words x ON x.doc_id = c.a
       |  JOIN words y ON y.doc_id = c.b AND y.w = x.w
       |  GROUP BY 1, 2)
       |SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
       |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
       |ORDER BY a, b""".stripMargin
  }

  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE tokenize pass over the corpus: tok feeds the per-doc aggregate
    // AND the deletion signatures, and perDoc is referenced five times
    // downstream (full sigs, dels, candidate join, both verification
    // joins) — without materialization the whole explode+distinct pipeline
    // re-runs per reference (the defect the minhash/shingle paths had)
    val tok = tokens(s, dir)
      .select($"doc_id", $"w", ((lit(A(0)) * tokenCode($"w") + B(0)) % P).as("hw"))
      .pin(true)
    val perDoc = tok.groupBy($"doc_id")
      .agg(sort_array(collect_list($"w")).as("arr"),
        count(lit(1)).as("n"), sum($"hw").as("h"))
      .pin(true)
    val full = perDoc.select($"doc_id", $"h".as("sig"))
    val dels = tok.join(perDoc.select($"doc_id", $"h"), Seq("doc_id"))
      .select($"doc_id", ($"h" - $"hw").as("sig"))
    val sigs = full.unionByName(dels)
    // full-vs-any collision covers equal sets (full=full) and one-token
    // supersets (full_A = del_B); normalize to a<b
    val cand = full.select($"doc_id".as("x"), $"sig")
      .join(sigs.select($"doc_id".as("y"), $"sig"), Seq("sig"))
      .filter($"x" =!= $"y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .distinct()
    cand
      .join(perDoc.select($"doc_id".as("a"), $"arr".as("aa"), $"n".as("na")),
        Seq("a"))
      .join(perDoc.select($"doc_id".as("b"), $"arr".as("ab"), $"n".as("nb")),
        Seq("b"))
      .withColumn("c", size(array_intersect($"aa", $"ab")).cast("long"))
      .withColumn("jaccard",
        round($"c".cast("double") / ($"na" + $"nb" - $"c"), 4))
      .filter($"c".cast("double") / ($"na" + $"nb" - $"c") >= 0.95)
      .select($"a", $"b", $"jaccard")
      .orderBy($"a", $"b")
  }

  val jaccardPairsSql: String = tokCte +
    """, sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
      |  FROM tok x JOIN tok y ON x.w = y.w AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
      |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.95
      |ORDER BY a, b""".stripMargin

  /** Word-shingle (3-gram) MinHash: the full shingle→minhash→band→bucket
    * pipeline over ORDER-SENSITIVE 3-word shingles (token-set MinHash above
    * ignores order; shingles catch reorderings as different content).
    * Shingle codes fold the three word codes with the modular polynomial;
    * positions come from posexplode + lead(), identical in SQL.
    */
  private[operators] def shingleCodes(s: SparkSession, dir: String): DataFrame =
    shingleCodesOf(Tables.documents(s, dir))

  /** Shingle codes of an arbitrary document frame — lets callers shingle a
    * pre-filtered subset (e.g. just the eval split) instead of paying a
    * full-corpus shingling pass and filtering after.
    */
  private[operators] def shingleCodesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // Per-ROW shingling (r17): the 3-gram fold over consecutive token
    // codes is a pure array expression — token codes via transform, the
    // trigram window via sequence + element_at — so the
    // explode-then-lead-window form's per-derivation exchange + sort of
    // every token (Window.partitionBy(doc_id)) is gone entirely. The
    // audits/pair queries deliberately re-derive codes instead of
    // checkpointing a corpus-sized frame (the prefixPairs memory rule),
    // which made each derivation's window shuffle the dominant repeated
    // cost; a per-row derivation is scan + explode + distinct only.
    // Value-identical: same split, same token order, same modular fold;
    // docs with fewer than 3 tokens emitted no c2-complete shingle before
    // and are filtered out before the (ascending-only) sequence here.
    docs
      .select($"doc_id",
        transform(split($"text", " "), w => tokenCode(w)).as("cs"))
      .filter(size($"cs") >= 3)
      // the distinct is PER-ROW too: all of one doc's shingles live in
      // one array, and the global DISTINCT (doc_id, code) is exactly the
      // per-doc distinct since doc_id is part of the key — array_distinct
      // replaces a corpus-sized exchange per derivation
      .select($"doc_id", explode(array_distinct(transform(
        sequence(lit(0), size($"cs") - 3),
        // reduced mod M so the minhash multiply a*code stays < 2^63
        i => ((element_at($"cs", i + 1) % M * 131071L
          + element_at($"cs", i + 2)) % M * 131071L
          + element_at($"cs", i + 3)) % M))).as("code"))
  }

  private val shingleCte =
    s"""WITH toks AS (
       |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
       |         unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |wcodes AS (SELECT doc_id, pos, $tokenCodeSql AS c0 FROM toks),
       |scodes AS (
       |  SELECT doc_id, c0,
       |    lead(c0, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
       |    lead(c0, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2
       |  FROM wcodes),
       |codes AS (
       |  SELECT DISTINCT doc_id,
       |    ((c0 % $M * 131071 + c1) % $M * 131071 + c2) % $M AS code
       |  FROM scodes WHERE c2 IS NOT NULL)
       |""".stripMargin

  /** Shingle-MinHash signatures (8 permutations over distinct 3-shingles). */
  def shingleMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shingleMinhashOf(shingleCodes(s, dir)).orderBy($"doc_id")
  }

  /** Signatures from an already-built (doc_id, code) frame — lets callers
    * that materialized the codes (containmentPairs) reuse them instead of
    * re-shingling the corpus.
    */
  private def shingleMinhashOf(codes: DataFrame): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    val aggs = A.indices.map(j =>
      min((lit(A(j)) * $"code" + B(j)) % P).as(s"mh$j"))
    codes.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
  }

  val shingleMinhashSql: String = shingleCte + {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(",\n  ")
    s"""SELECT doc_id,
       |  $cols
       |FROM codes GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Exact n-gram overlap pairs (the exact-substring dedup family — Lee
    * et al., "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022): every pair of docs sharing at least one exact 4-word
    * window, with the count of DISTINCT shared windows as the overlap
    * strength. Unlike the MinHash/shingle-LSH emitters this is NOT a
    * sketch — the join key is the window fingerprint itself, so recall
    * is 1 by construction and the oracle equality is definitional.
    *
    * WINDOW IDENTITY is a dual-channel fingerprint, and the width is
    * load-bearing (measured, round 9): a first cut keyed windows on the
    * prefix-packed [[tokenCode]] folded mod 2^31, and the 100× scaling
    * corpus blew up ×715 instead of ×100 — tokenCode packs (first 3
    * chars, length, LAST char), so the 100-shard suffixes "s12"/"s22"/…
    * collide systematically and whole shard vocabularies collapse into
    * one code space (the same sketch-input defect class as round 7's
    * prefix collapse, one corpus decade later). Windows are therefore
    * keyed on TWO independent full-character polynomial word hashes
    * (the [[fingerprint]] aggregate ≡ list_reduce idiom — every char
    * participates, so no packing artifact can collide two distinct
    * words) folded per 4-gram into the pair (g1, g2): an effective
    * ~2^61-value window space in which birthday collisions are
    * negligible until ~10^9 distinct windows per df-cap bucket.
    *
    * Scale guards, both essential at 100 TB:
    *  - BOILERPLATE DF-CAP: windows appearing in more than 32 docs
    *    (licenses, headers, navigation chrome) are dropped BEFORE the
    *    pair join. An m-doc window alone emits C(m,2) pairs, so one
    *    viral sentence would otherwise go quadratic; the cap bounds each
    *    window's contribution at C(32,2) and removes exactly the windows
    *    that carry no pairwise-dedup signal (standard practice in the
    *    exact-substring pipelines). The cap is one mergeable
    *    groupBy(g1, g2) count.
    *  - the pair aggregation groups on (a, b) — output is bounded by
    *    TRUE overlap volume; per-window pair rows exist only inside the
    *    exchange, never materialized.
    */
  def ngramOverlapPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // two independent full-char rolling hashes per word: channel params
    // (init, mult, mod) differ; mod < 2^31 keeps every gram-fold product
    // below 2^49 — exact in int64 and float64 in both engines
    def wordHash(w: Column, init: Long, mult: Long, mod: Long): Column =
      aggregate(split(w, ""), lit(init),
        (acc, c) => (acc * mult + ascii(c)) % mod)
    def gramFold(cs: Seq[Column]): Column =
      cs.reduceLeft((acc, c) => (acc % M * 131071L + c) % M)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val grams = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .select($"doc_id", $"pos",
        wordHash($"w", 7L, 31L, 1000000007L).as("c0"),
        wordHash($"w", 13L, 131L, 998244353L).as("d0"))
      .withColumn("c1", lead($"c0", 1).over(w))
      .withColumn("c2", lead($"c0", 2).over(w))
      .withColumn("c3", lead($"c0", 3).over(w))
      .withColumn("d1", lead($"d0", 1).over(w))
      .withColumn("d2", lead($"d0", 2).over(w))
      .withColumn("d3", lead($"d0", 3).over(w))
      .filter($"c3".isNotNull)
      .select($"doc_id",
        gramFold(Seq($"c0", $"c1", $"c2", $"c3")).as("g1"),
        gramFold(Seq($"d0", $"d1", $"d2", $"d3")).as("g2"))
      .distinct()
    // df-capped gram frame, materialized once: both self-join sides and
    // nothing else read it (grams are distinct per doc, so the per-key
    // count IS document frequency)
    val kept = grams.join(
        grams.groupBy($"g1", $"g2").agg(count(lit(1)).as("df"))
          .filter($"df" <= 32L),
        Seq("g1", "g2"))
      .select($"doc_id", $"g1", $"g2")
      .pin(true)
    kept.select($"doc_id".as("a"), $"g1", $"g2")
      .join(kept.select($"doc_id".as("b"), $"g1", $"g2"), Seq("g1", "g2"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy($"a", $"b")
  }

  val ngramOverlapPairsSql: String = {
    def wh(init: Long, mult: Long, mod: Long): String =
      s"""list_reduce(list_prepend($init::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(w, '')]),
         |    (a, b) -> (a * $mult + b) % $mod)""".stripMargin
    def fold(cs: Seq[String]): String =
      cs.reduceLeft((acc, c) => s"(($acc) % $M * 131071 + $c) % $M")
    s"""WITH toks AS (
       |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
       |         unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |wcodes AS (
       |  SELECT doc_id, pos,
       |    ${wh(7L, 31L, 1000000007L)} AS c0,
       |    ${wh(13L, 131L, 998244353L)} AS d0
       |  FROM toks),
       |scodes AS (
       |  SELECT doc_id, c0, d0,
       |    lead(c0, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
       |    lead(c0, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2,
       |    lead(c0, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS c3,
       |    lead(d0, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS d1,
       |    lead(d0, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS d2,
       |    lead(d0, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS d3
       |  FROM wcodes),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |    ${fold(Seq("c0", "c1", "c2", "c3"))} AS g1,
       |    ${fold(Seq("d0", "d1", "d2", "d3"))} AS g2
       |  FROM scodes WHERE c3 IS NOT NULL),
       |kept AS (
       |  SELECT g.doc_id, g.g1, g.g2 FROM grams g
       |  JOIN (SELECT g1, g2 FROM grams GROUP BY g1, g2
       |        HAVING count(*) <= 32) d USING (g1, g2))
       |SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS n_shared
       |FROM kept a JOIN kept b
       |  ON a.g1 = b.g1 AND a.g2 = b.g2 AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY a, b""".stripMargin
  }

  /** Per-doc 4-gram NOVELTY: the fraction of a document's 4-word windows
    * whose GLOBAL first occurrence (min (doc_id, pos) over the corpus in
    * doc order) is that very window — i.e. text never seen in any earlier
    * document or earlier position. The memorization/novelty curve of the
    * exact-substring dedup family (Lee et al. 2022): a crawl snapshot
    * whose per-doc novelty collapses is re-crawling itself, and documents
    * with near-zero novelty are pure recombinations of earlier text.
    * Windows are keyed on the same dual full-char fingerprint as
    * [[ngramOverlapPairs]] (collision-safe at corpus scale); permille is
    * exact integer.
    *
    * Scale: one content-keyed mergeable min-aggregation (the same shuffle
    * shape as exact dedup) + one content-keyed join back — NO pair
    * emission at all, so unlike the overlap miner this needs no df-cap;
    * cost is linear in corpus tokens regardless of duplication structure.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def wordHash(w: Column, init: Long, mult: Long, mod: Long): Column =
      aggregate(split(w, ""), lit(init),
        (acc, c) => (acc * mult + ascii(c)) % mod)
    def gramFold(cs: Seq[Column]): Column =
      cs.reduceLeft((acc, c) => (acc % M * 131071L + c) % M)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val grams = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .select($"doc_id", $"pos",
        wordHash($"w", 7L, 31L, 1000000007L).as("c0"),
        wordHash($"w", 13L, 131L, 998244353L).as("d0"))
      .withColumn("c1", lead($"c0", 1).over(w))
      .withColumn("c2", lead($"c0", 2).over(w))
      .withColumn("c3", lead($"c0", 3).over(w))
      .withColumn("d1", lead($"d0", 1).over(w))
      .withColumn("d2", lead($"d0", 2).over(w))
      .withColumn("d3", lead($"d0", 3).over(w))
      .filter($"c3".isNotNull)
      .select($"doc_id", $"pos",
        gramFold(Seq($"c0", $"c1", $"c2", $"c3")).as("g1"),
        gramFold(Seq($"d0", $"d1", $"d2", $"d3")).as("g2"))
      .pin(true) // owner agg + the join back
    val owner = grams.groupBy($"g1", $"g2")
      .agg(min(struct($"doc_id", $"pos")).as("first"))
    grams.join(owner, Seq("g1", "g2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when($"first.doc_id" === $"doc_id" && $"first.pos" === $"pos",
          1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_windows", $"n_novel",
        floor(lit(1000L) * $"n_novel" / $"n_windows").cast("long")
          .as("novelty_pm"))
      .orderBy($"doc_id")
  }

  val ngramNoveltySql: String = {
    def wh(init: Long, mult: Long, mod: Long): String =
      s"""list_reduce(list_prepend($init::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(w, '')]),
         |    (a, b) -> (a * $mult + b) % $mod)""".stripMargin
    def fold(cs: Seq[String]): String =
      cs.reduceLeft((acc, c) => s"(($acc) % $M * 131071 + $c) % $M")
    s"""WITH toks AS (
       |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
       |         unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |wcodes AS (
       |  SELECT doc_id, pos,
       |    ${wh(7L, 31L, 1000000007L)} AS c0,
       |    ${wh(13L, 131L, 998244353L)} AS d0
       |  FROM toks),
       |scodes AS (
       |  SELECT doc_id, pos, c0, d0,
       |    lead(c0, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
       |    lead(c0, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2,
       |    lead(c0, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS c3,
       |    lead(d0, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS d1,
       |    lead(d0, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS d2,
       |    lead(d0, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS d3
       |  FROM wcodes),
       |grams AS (
       |  SELECT doc_id, pos,
       |    ${fold(Seq("c0", "c1", "c2", "c3"))} AS g1,
       |    ${fold(Seq("d0", "d1", "d2", "d3"))} AS g2
       |  FROM scodes WHERE c3 IS NOT NULL),
       |owner AS (
       |  SELECT g1, g2, min(doc_id * 4294967296 + pos) AS fk
       |  FROM grams GROUP BY g1, g2)
       |SELECT doc_id, count(*)::BIGINT AS n_windows,
       |  sum(CASE WHEN doc_id * 4294967296 + pos = fk THEN 1 ELSE 0 END)
       |    ::BIGINT AS n_novel,
       |  ((1000 * sum(CASE WHEN doc_id * 4294967296 + pos = fk
       |               THEN 1 ELSE 0 END)) // count(*))::BIGINT AS novelty_pm
       |FROM grams JOIN owner USING (g1, g2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Duplicated-span threshold: a position is duplicated when its
    * [[DupN]]-word window occurs at least twice corpus-wide. The paper
    * uses 50 BPE tokens on web crawl; 8 words is the same idea scaled to
    * this corpus's short synthetic documents. The GRAIN is a parameter of
    * every miner below (VERDICT r12 item 7) — the gate queries pin n=8,
    * ScalingBench's `dup_grain` sweep measures span sensitivity at
    * 8/16/32, and the choice is documented in PLANS.md: wider grains
    * only ever shrink coverage (an n-dup position is also covered at any
    * smaller grain), so n trades recall of short boilerplate against
    * false hits on formulaic-but-legitimate runs.
    */
  private val DupN = 8

  /** Maximal duplicated spans — the REMOVAL artifact of the
    * exact-substring dedup family (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022, the ExactSubstr
    * pass): every duplicated position covers words [pos, pos+n-1], and
    * overlapping-or-adjacent covered intervals merge (gaps-and-islands)
    * into the MAXIMAL spans a removal pass would cut. Intra-document
    * repeats count as duplication, per the paper. Returns one row per
    * (doc_id, island) with span bounds, width, hit count and the doc's
    * word count.
    *
    * Identity & scale: windows are keyed on the dual full-char
    * polynomial fingerprint of [[ngramOverlapPairs]] (~2^61 space — no
    * packing artifact can equate distinct words, the round-9 lesson), so
    * the corpus-sized exchange ships two longs per position, never
    * 8-word strings. Duplication is ONE content-keyed window count
    * (`count(*) OVER (PARTITION BY g1, g2)`) — a single exchange, no
    * join-back, no pair emission, hence no df-cap needed: cost is linear
    * in corpus tokens whatever the duplication structure (a viral
    * boilerplate line costs its occurrence count, never its square).
    * The island merge and span fold are doc_id-keyed windows/aggs over
    * the (small) duplicated subset. Nothing is quadratic or driver-side.
    */
  /** Duplicated gram-start positions: (doc_id, nw, pos) for every
    * position whose [[DupN]]-gram occurs at least twice corpus-wide.
    * The shared front half of the span miner and the removal applier.
    */
  private[operators] def dupHitsOf(docs: DataFrame,
      n: Int = DupN): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def wordHash(w: Column, init: Long, mult: Long, mod: Long): Column =
      aggregate(split(w, ""), lit(init),
        (acc, c) => (acc * mult + ascii(c)) % mod)
    def gramFold(cs: Seq[Column]): Column =
      cs.reduceLeft((acc, c) => (acc % M * 131071L + c) % M)
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val codes = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("nw"),
        posexplode(split($"text", " ")).as(Seq("pos0", "w")))
      .select($"doc_id", $"nw", ($"pos0" + 1L).as("pos"),
        wordHash($"w", 7L, 31L, 1000000007L).as("c0"),
        wordHash($"w", 13L, 131L, 998244353L).as("d0"))
    val leads = (1 until n).foldLeft(codes) { (df, j) =>
      df.withColumn(s"c$j", lead(col("c0"), j).over(dw))
        .withColumn(s"d$j", lead(col("d0"), j).over(dw))
    }
    val grams = leads
      .filter(col(s"c${n - 1}").isNotNull)
      .select($"doc_id", $"nw", $"pos",
        gramFold((0 until n).map(j => col(s"c$j"))).as("g1"),
        gramFold((0 until n).map(j => col(s"d$j"))).as("g2"))
    grams
      .withColumn("occ",
        count(lit(1)).over(Window.partitionBy($"g1", $"g2")))
      .filter($"occ" >= 2L)
      .select($"doc_id", $"nw", $"pos")
  }

  private[operators] def dupSpansOf(docs: DataFrame,
      n: Int = DupN): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val hits = dupHitsOf(docs, n)
    val prev = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    hits
      .withColumn("brk",
        when($"pos" > coalesce(max($"pos" + lit(n - 1).cast("long"))
          .over(prev), lit(-1L)) + 1L, 1L).otherwise(0L))
      .withColumn("island", sum($"brk").over(dw))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("span_start"),
        (max($"pos") + lit(n - 1).cast("long")).as("span_end"),
        (max($"pos") + lit(n).cast("long") - min($"pos"))
          .as("span_words"),
        count(lit(1)).as("gram_hits"),
        max($"nw").as("total_words"))
  }

  /** Per-document duplicated-mass report of [[dupSpansOf]]: span count,
    * words covered by duplicated spans, document length and the exact
    * integer-permille duplicated fraction — the read that decides which
    * corpus slices need the removal pass at all. Only documents with at
    * least one duplicated span appear.
    */
  def dupSpanStats(s: SparkSession, dir: String): DataFrame =
    dupSpanStatsAt(s, dir, DupN)

  /** [[dupSpanStats]] at an explicit grain `n` — the sensitivity knob
    * ScalingBench's `dup_grain` sweep turns (the gate stays at n=8).
    */
  def dupSpanStatsAt(s: SparkSession, dir: String, n: Int): DataFrame = {
    import s.implicits._
    dupSpansOf(Tables.documents(s, dir), n)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum($"span_words").as("dup_words"),
        max($"total_words").as("total_words"))
      .select($"doc_id", $"n_spans", $"dup_words", $"total_words",
        expr("(1000 * dup_words) div total_words").as("dup_pm"))
      .orderBy($"doc_id")
  }

  /** The cut manifest itself: one row per maximal duplicated span with
    * its word-index bounds — what a removal job consumes. Deterministic
    * total order (doc_id, span_start); spans within a doc are disjoint
    * and non-adjacent by construction of the island merge.
    */
  def dupSpanCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dupSpansOf(Tables.documents(s, dir))
      .select($"doc_id", $"span_start", $"span_end", $"span_words",
        $"gram_hits")
      .orderBy($"doc_id", $"span_start")
  }

  /** The removal APPLIED: every document rebuilt with its duplicated
    * spans cut out — the cleaned corpus an ExactSubstr pass ships, with
    * per-doc kept/cut word accounting. A word at position p is cut iff
    * some duplicated gram starts in [p-n+1, p]; since word positions
    * are dense, that is a windowed `max` over the previous n-1 ROWS of
    * the dup-start flag — one doc_id-keyed join of the corpus against
    * the (small) dup-start set plus doc_id-keyed window/agg, so the
    * apply pass adds NO content-keyed exchange beyond the miner's own.
    * Untouched documents round-trip bit-identically (spec law).
    */
  def dupSpanApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val starts = dupHitsOf(docs)
      .select($"doc_id", $"pos", lit(1L).as("hit"))
    val cover = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(-(DupN - 1), 0)
    docs
      .select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos0", "w")))
      .select($"doc_id", ($"pos0" + 1L).as("pos"), $"w")
      .join(starts, Seq("doc_id", "pos"), "left")
      .withColumn("cut", coalesce(max($"hit").over(cover), lit(0L)))
      .groupBy($"doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(
            when($"cut" === 0L, struct($"pos", $"w")))),
          x => x("w")), " ").as("clean_text"),
        sum(lit(1L) - $"cut").as("kept_words"),
        sum($"cut").as("cut_words"))
      .orderBy($"doc_id")
  }

  private val dupHitsCte: String = {
    def wh(init: Long, mult: Long, mod: Long): String =
      s"""list_reduce(list_prepend($init::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(w, '')]),
         |    (a, b) -> (a * $mult + b) % $mod)""".stripMargin
    def fold(cs: Seq[String]): String =
      cs.reduceLeft((acc, c) => s"(($acc) % $M * 131071 + $c) % $M")
    val leadCols = (1 until DupN).flatMap(j => Seq(
      s"lead(c0, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS c$j",
      s"lead(d0, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS d$j"))
      .mkString(",\n    ")
    s"""WITH toks AS (
       |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
       |         unnest(string_split(text, ' ')) AS w,
       |         len(string_split(text, ' '))::BIGINT AS nw
       |  FROM documents),
       |wcodes AS (
       |  SELECT doc_id, pos, nw,
       |    ${wh(7L, 31L, 1000000007L)} AS c0,
       |    ${wh(13L, 131L, 998244353L)} AS d0
       |  FROM toks),
       |scodes AS (
       |  SELECT doc_id, pos, nw, c0, d0,
       |    $leadCols
       |  FROM wcodes),
       |grams AS (
       |  SELECT doc_id, pos, nw,
       |    ${fold((0 until DupN).map(j => s"c$j"))} AS g1,
       |    ${fold((0 until DupN).map(j => s"d$j"))} AS g2
       |  FROM scodes WHERE c${DupN - 1} IS NOT NULL),
       |hits AS (
       |  SELECT doc_id, pos, nw FROM (
       |    SELECT doc_id, pos, nw,
       |      count(*) OVER (PARTITION BY g1, g2) AS occ FROM grams) t
       |  WHERE occ >= 2)
       |""".stripMargin
  }

  private val dupSpanCte: String = dupHitsCte +
    s""",
       |brks AS (
       |  SELECT doc_id, pos, nw,
       |    CASE WHEN pos > coalesce(max(pos + ${DupN - 1}) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |      THEN 1 ELSE 0 END AS brk
       |  FROM hits),
       |isl AS (
       |  SELECT doc_id, pos, nw,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM brks),
       |spans AS (
       |  SELECT doc_id, island,
       |    min(pos)::BIGINT AS span_start,
       |    (max(pos) + ${DupN - 1})::BIGINT AS span_end,
       |    (max(pos) + $DupN - min(pos))::BIGINT AS span_words,
       |    count(*)::BIGINT AS gram_hits,
       |    max(nw)::BIGINT AS total_words
       |  FROM isl GROUP BY doc_id, island)
       |""".stripMargin

  val dupSpanStatsSql: String = dupSpanCte +
    s"""SELECT doc_id, count(*)::BIGINT AS n_spans,
       |  sum(span_words)::BIGINT AS dup_words,
       |  max(total_words)::BIGINT AS total_words,
       |  ((1000 * sum(span_words)) // max(total_words))::BIGINT AS dup_pm
       |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val dupSpanCutsSql: String = dupSpanCte +
    """SELECT doc_id, span_start, span_end, span_words, gram_hits
      |FROM spans ORDER BY doc_id, span_start""".stripMargin

  val dupSpanApplySql: String = dupHitsCte +
    s""",
       |cov AS (
       |  SELECT t.doc_id, t.pos, t.w,
       |    max(CASE WHEN h.pos IS NOT NULL THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY t.doc_id ORDER BY t.pos
       |      ROWS BETWEEN ${DupN - 1} PRECEDING AND CURRENT ROW) AS cut
       |  FROM toks t LEFT JOIN hits h
       |    ON t.doc_id = h.doc_id AND t.pos = h.pos)
       |SELECT doc_id,
       |  coalesce(string_agg(w, ' ' ORDER BY pos) FILTER (WHERE cut = 0),
       |           '') AS clean_text,
       |  sum(CASE WHEN cut = 0 THEN 1 ELSE 0 END)::BIGINT AS kept_words,
       |  sum(cut)::BIGINT AS cut_words
       |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shingle-LSH candidate pairs (2 bands × 4 rows over the shingle
    * signatures) — the bucket-join stage of the shingle pipeline.
    */
  def shinglePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    shinglePairsOf(shingleCodes(s, dir)).orderBy($"a", $"b")
  }

  /** Candidate pairs from an already-built (doc_id, code) frame (unordered
    * — the public query adds the deterministic sort).
    */
  private[operators] def shinglePairsOf(codes: DataFrame,
      aPred: Option[Column => Column] = None): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    // materialized for the same reason as minhashPairs' signatures: band
    // union × self-join would otherwise re-run the shingling agg 4×;
    // first-matching-band emission (see minhashPairs) replaces the
    // pair distinct with a filter riding the join
    val sig = shingleMinhashOf(codes).pin(true)
    val bands = sig.select($"doc_id",
        bandSig((0 until 4).map(i => col(s"mh$i"))).as("sig0"),
        bandSig((4 until 8).map(i => col(s"mh$i"))).as("sig1"))
      .select($"doc_id", $"sig0", explode(array(
        struct(lit(0).as("band"), $"sig0".as("sig")),
        struct(lit(1).as("band"), $"sig1".as("sig")))).as("e"))
      .select($"doc_id", $"sig0", $"e.band", $"e.sig")
    // aPred restricts the LEFT (min-id) side BEFORE the bucket join —
    // the sampled recall audit's lever: per-bucket volume drops from
    // |bucket|^2 to |stratum slice| x |bucket|
    val l0 = bands.select($"doc_id".as("a"), $"sig0".as("s0a"), $"band", $"sig")
    // None leaves l structurally identical to r (exchange-reuse safe);
    // the filter node exists only when a stratum is actually requested
    val l = aPred.fold(l0)(p => l0.filter(p($"a")))
    val r = bands.select($"doc_id".as("b"), $"sig0".as("s0b"), $"band", $"sig")
    l.join(r, Seq("band", "sig"))
      .filter($"a" < $"b" && ($"band" === 0 || $"s0a" =!= $"s0b"))
      .select($"a", $"b")
  }

  /** sigs/bands/pairs CTEs over `codes` — the ONE copy of the banding SQL,
    * shared by the three shingle-LSH oracles (pairs, clusters, containment)
    * so the band count / fold constants can never drift between them.
    */
  /** The banded-LSH pair CTE with a predicate pushed into the bucket
    * join's LEFT (= min-endpoint, since l.doc_id < r.doc_id) side —
    * mirrors [[prefixCtesWith]] so a min-endpoint stratum restriction
    * (the sampled recall audit) prunes the join itself instead of
    * relying on the optimizer to push a post-DISTINCT filter.
    */
  private def shingleBandsCteWith(aCond: String): String = {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(", ")
    def sig(i: Int) =
      (1 until 4).foldLeft(s"mh${i}")((acc, j) =>
        s"(($acc) % $M * 131071 + mh${i + j}) % $M")
    s""", sigs AS (SELECT doc_id, $cols FROM codes GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${sig(0)} AS sig FROM sigs
       |  UNION ALL SELECT doc_id, 1, ${sig(4)} FROM sigs),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
       |  WHERE $aCond)""".stripMargin
  }

  private val shingleBandsCte: String = shingleBandsCteWith("TRUE")

  val shinglePairsSql: String = shingleCte + shingleBandsCte +
    "\nSELECT a, b FROM pairs ORDER BY a, b"

  /** Asymmetric CONTAINMENT dedup: among the shingle-LSH candidate pairs,
    * pairs where one doc's shingle set is ≥80% contained in the other —
    * the subset/boilerplate case Jaccard misses (a paragraph quoted inside
    * a long doc has high containment but low Jaccard, because the union is
    * dominated by the long doc). Containment(A→B) = |A∩B| / |A|, per
    * direction. Candidate-bounded like every pair op here: the shared-
    * shingle count joins only LSH candidates, never all pairs; shingle
    * sizes join back from a per-doc aggregate.
    */
  /** Per-doc shingle-set sizes from the (checkpointed) codes frame. */
  private def shingleSizes(codes: DataFrame): DataFrame = {
    import codes.sparkSession.implicits._
    codes.groupBy($"doc_id").agg(count(lit(1)).as("n"))
  }

  /** (a, b, c): shared-shingle count for EVERY LSH candidate pair — the
    * ONE copy of the candidate-intersection join, shared by containment
    * and the threshold curve. LEFT join from the candidates: a band-fold
    * collision can pair docs sharing no shingle, and such a pair must
    * surface with c = 0, not vanish (the threshold curve's t = 0 anchor
    * counts every candidate). The candidate frame is checkpointed — it
    * feeds both sides of the left join.
    */
  private def shingleInterCounts(codes: DataFrame): DataFrame = {
    import codes.sparkSession.implicits._
    val pairs = shinglePairsOf(codes).pin(true)
    val inter = pairs
      .join(codes.select($"doc_id".as("a"), $"code"), Seq("a"))
      .join(codes.select($"doc_id".as("b"), $"code"), Seq("b", "code"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    pairs.join(inter, Seq("a", "b"), "left")
      .select($"a", $"b", coalesce($"c", lit(0L)).as("c"))
  }

  /** sz + inter CTEs over `codes`/`pairs` — the SQL mirror of
    * [[shingleSizes]]/[[shingleInterCounts]], shared by the same two
    * oracles so the intersection semantics can never drift.
    */
  private val shingleInterCte: String =
    """,
      |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM codes GROUP BY doc_id),
      |inter AS (
      |  SELECT p.a, p.b, coalesce(i.c, 0)::BIGINT AS c
      |  FROM pairs p LEFT JOIN (
      |    SELECT p2.a, p2.b, count(*)::BIGINT AS c
      |    FROM pairs p2
      |    JOIN codes ca ON ca.doc_id = p2.a
      |    JOIN codes cb ON cb.doc_id = p2.b AND cb.code = ca.code
      |    GROUP BY 1, 2) i ON p.a = i.a AND p.b = i.b)""".stripMargin

  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one shingling pass, checkpointed: candidates, sizes, and the
    // intersection join all fan out from this frame
    val codes = shingleCodes(s, dir).pin(true)
    val sizes = shingleSizes(codes)
    shingleInterCounts(codes)
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .select($"a", $"b", $"c",
        round($"c" * 1.0 / $"na", 4).as("cont_a"),
        round($"c" * 1.0 / $"nb", 4).as("cont_b"))
      .filter(greatest($"cont_a", $"cont_b") >= 0.8)
      .orderBy($"a", $"b")
  }

  val containmentPairsSql: String = shingleCte + shingleBandsCte +
    shingleInterCte +
    """
      |SELECT a, b, c, round(c * 1.0 / sa.n, 4) AS cont_a,
      |  round(c * 1.0 / sb.n, 4) AS cont_b
      |FROM inter
      |JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
      |WHERE greatest(round(c * 1.0 / sa.n, 4), round(c * 1.0 / sb.n, 4)) >= 0.8
      |ORDER BY a, b""".stripMargin

  /** Threshold CALIBRATION curve: over the shingle-LSH candidate pairs,
    * exact shingle-Jaccard per pair, then the pair count surviving each
    * candidate threshold — the number a pipeline operator reads to pick
    * its dedup cutoff (too low merges distinct docs, too high leaves
    * duplicates). One shingling pass (checkpointed), the same
    * candidate-bounded intersection join as [[containmentPairs]], then a
    * SINGLE row of conditional sums unpivoted to (threshold, n_pairs) —
    * no per-threshold rescans, so trying 5 cutoffs costs the same as
    * trying one. Monotone by construction (each count ⊇ the next).
    */
  def thresholdCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val codes = shingleCodes(s, dir).pin(true)
    val sizes = shingleSizes(codes)
    val jac = shingleInterCounts(codes)
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .select(round($"c" * 1.0 / ($"na" + $"nb" - $"c"), 4).as("jac"))
    val ts = Seq(0.0, 0.5, 0.6, 0.7, 0.8, 0.9)
    // count(when(...)) not sum(...otherwise(0)): on an EMPTY candidate set
    // the aggregate must produce 0 like the oracle's COUNT, never NULL
    val aggs = ts.map(t =>
      count(when($"jac" >= t, lit(1))).as(s"n${(t * 10).toInt}"))
    jac.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ts.map(t => struct(lit(t).as("threshold"),
        col(s"n${(t * 10).toInt}").as("n_pairs"))): _*)).as("e"))
      .select($"e.threshold".as("threshold"), $"e.n_pairs".as("n_pairs"))
      .orderBy($"threshold")
  }

  val thresholdCurveSql: String = shingleCte + shingleBandsCte +
    shingleInterCte +
    """,
      |jac AS (
      |  SELECT round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jac
      |  FROM inter i
      |  JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id),
      |t AS (SELECT unnest([0.0, 0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[]) AS threshold)
      |SELECT threshold,
      |  (SELECT count(*) FROM jac WHERE jac >= threshold)::BIGINT AS n_pairs
      |FROM t ORDER BY threshold""".stripMargin

  /** b-BIT minwise hashing (Li & König 2010, b = 1): for every shingle-LSH
    * candidate pair, the count of 1-bit minhash agreements across the 8
    * permutations, the debiased resemblance estimate Ĵ = 2·(c/8) − 1
    * (a 1-bit collision happens at rate J + (1 − J)/2, so the raw rate
    * must be unskewed — the whole point of the paper), and the EXACT
    * Jaccard alongside as the error surface. This is the storage
    * trade the sketch family ends on: 1 bit per permutation is 32×
    * smaller than the 4-byte minhash, paid for in estimator variance —
    * visible here as est_pm's 125-permille quantization against the
    * smooth exact column.
    *
    * Scale: signatures and the candidate-bounded intersection are the
    * measured [[thresholdCurve]] shapes; the bit comparisons are one
    * codegen'd expression over the joined signature rows.
    */
  def bbitPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val codes = shingleCodes(s, dir).pin(true)
    val sigs = shingleMinhashOf(codes)
    val sizes = shingleSizes(codes)
    def side(tag: String): DataFrame =
      sigs.select(col("doc_id").as(tag) +:
        A.indices.map(j => (col(s"mh$j") % 2L).as(s"$tag$j")): _*)
    val cand = shinglePairsOf(codes)
    val collide = A.indices
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val jac = shingleInterCounts(codes)
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .select($"a", $"b",
        round($"c" * 1.0 / ($"na" + $"nb" - $"c"), 4).as("jaccard"))
    cand.join(side("a"), Seq("a")).join(side("b"), Seq("b"))
      .select($"a", $"b", collide.as("n_collide"))
      .withColumn("est_pm",
        greatest((lit(2L) * $"n_collide" - 8L) * 125L, lit(0L)))
      .join(jac, Seq("a", "b"))
      .orderBy($"a", $"b")
  }

  lazy val bbitPairsSql: String = shingleCte + shingleBandsCte +
    shingleInterCte + {
      val collide = A.indices
        .map(j => s"CASE WHEN sa.mh$j % 2 = sb.mh$j % 2 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s""",
         |bb AS (
         |  SELECT p.a, p.b, ($collide)::BIGINT AS n_collide
         |  FROM pairs p JOIN sigs sa ON p.a = sa.doc_id
         |               JOIN sigs sb ON p.b = sb.doc_id)
         |SELECT bb.a, bb.b, bb.n_collide,
         |  greatest((2 * bb.n_collide - 8) * 125, 0)::BIGINT AS est_pm,
         |  round(i.c * 1.0 / (sza.n + szb.n - i.c), 4) AS jaccard
         |FROM bb JOIN inter i ON bb.a = i.a AND bb.b = i.b
         |JOIN sz sza ON bb.a = sza.doc_id
         |JOIN sz szb ON bb.b = szb.doc_id
         |ORDER BY bb.a, bb.b""".stripMargin
    }

  /** AllPairs prefix-filtered EXACT similarity join (Bayardo, Ma &
    * Srikant, WWW'07 "Scaling up all pairs similarity search"; the
    * SSJoin/ppjoin family): every doc pair with shingle-set Jaccard ≥ 0.8,
    * found COMPLETELY — the deterministic, zero-miss complement of the
    * shingle-LSH candidate generator (`dedup_jaccard_pairs`), without the
    * all-pairs intersection join.
    *
    * The prefix theorem: order the universe by document frequency
    * ascending (rarest shingles first, ties by code); for a doc with n
    * distinct shingles keep only its first p = n − ⌈0.8·n⌉ + 1 shingles as
    * join keys. Two docs whose prefixes are disjoint share < the minimum
    * overlap Jaccard 0.8 demands, so joining PREFIXES on shingle code
    * loses no true pair. A size filter (5·min(na,nb) ≥ 4·max — Jaccard ≥
    * 0.8 forces |a|, |b| within 25% of each other) prunes further before
    * the distinct. Exact Jaccard is then verified on the candidate-bounded
    * intersection join only.
    *
    * Scale: candidate volume is Σ_code C(prefix-df, 2) where the
    * df-ASCENDING order steers every doc's rarest shingles into its
    * prefix — the Zipf head never becomes a join key (the same df
    * discipline as the capped hybrid-RRF lexical channel, here with a
    * completeness proof instead of a score bound). Measured at sf0.01:
    * 11,533 intersecting pairs exist, the prefix join emits 25 candidates,
    * and all 25 verify — pruning is 461× with zero false negatives.
    * Everything is keyed shuffles; nothing is all-pairs.
    */
  def prefixPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // codes deliberately NOT pinned despite the 5-consumer fanout: the
    // corpus-sized checkpoint competes with the prefix/verify joins for
    // unified memory — measured at the ×100 probe (50M shingle rows on
    // the 4.6 GiB harness) the pinned form dies with an executor heap
    // OOM while the recompute form finishes; the Affinity basket rule
    // (pins are for iterative chains and bounded frames), re-measured
    val codes = shingleCodes(s, dir)
    prefixPairsOf(codes).orderBy($"a", $"b")
  }

  /** The AllPairs core over an already-built codes frame — shared by the
    * public query and the recall audit (pinning is the caller's call:
    * corpus-sized codes frames must NOT be, see [[prefixPairs]]).
    */
  private def prefixPairsOf(codes: DataFrame,
      aPred: Option[Column => Column] = None): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    val sizes = shingleSizes(codes)
    val cand = prefixCandOf(codes, sizes, aPred).distinct()
    val inter = cand
      .join(codes.select($"doc_id".as("a"), $"code"), Seq("a"))
      .join(codes.select($"doc_id".as("b"), $"code"), Seq("b", "code"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .filter($"c" * 5L >= ($"na" + $"nb" - $"c") * 4L)
      .select($"a", $"b", $"c", $"na", $"nb",
        (($"c" * 1000L) / ($"na" + $"nb" - $"c")).cast("long").as("jac_pm"))
  }

  /** The AllPairs prefix CANDIDATE stage alone (pre-distinct — a pair can
    * surface once per shared prefix code): the recall audits consume it
    * unioned with the LSH candidate set through ONE shared intersection
    * join, so the stage is factored out of [[prefixPairsOf]]. `sizes`
    * comes from the caller so an already-pinned per-doc size frame is not
    * re-derived from the corpus.
    */
  private def prefixCandOf(codes: DataFrame, sizes: DataFrame,
      aPred: Option[Column => Column] = None): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dfq = codes.groupBy($"code").agg(count(lit(1)).as("df"))
    val ranked = codes.join(dfq, Seq("code"))
      .join(sizes, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"code")))
    // p = n − ⌈4n/5⌉ + 1; ⌈4n/5⌉ = (4n+4) div 5 for n > 0
    val pref = ranked
      .filter($"rk" <= $"n" - (($"n" * 4L + 4L) / 5L).cast("long") + 1L)
      .select($"doc_id", $"code", $"n")
    val prefA = pref.select($"doc_id".as("a"), $"code", $"n".as("na"))
    aPred.fold(prefA)(p => prefA.filter(p($"a")))
      .join(pref.select($"doc_id".as("b"), $"code", $"n".as("nb")),
        Seq("code"))
      .filter($"a" < $"b" &&
        least($"na", $"nb") * 5L >= greatest($"na", $"nb") * 4L)
      .select($"a", $"b")
  }

  /** The AllPairs prefix CTE chain (dfq/psz/rk/pref/cand/pinter) — one
    * copy shared by the pair query and the recall audit.
    */
  private def prefixCtesWith(aCond: String): String =
    s""", dfq AS (SELECT code, count(*)::BIGINT AS df FROM codes GROUP BY 1),
       |psz AS (SELECT doc_id, count(*)::BIGINT AS n FROM codes GROUP BY 1),
       |rk AS (
       |  SELECT c.doc_id, c.code, s.n,
       |    row_number() OVER (PARTITION BY c.doc_id ORDER BY d.df, c.code) AS rk
       |  FROM codes c JOIN dfq d USING (code) JOIN psz s USING (doc_id)),
       |pref AS (SELECT doc_id, code, n FROM rk WHERE rk <= n - (n*4+4)//5 + 1),
       |cand AS (
       |  SELECT DISTINCT pa.doc_id AS a, pb.doc_id AS b
       |  FROM pref pa JOIN pref pb ON pa.code = pb.code
       |    AND pa.doc_id < pb.doc_id
       |    AND $aCond
       |    AND least(pa.n, pb.n) * 5 >= greatest(pa.n, pb.n) * 4),
       |pinter AS (
       |  SELECT p.a, p.b, count(*)::BIGINT AS c
       |  FROM cand p JOIN codes ca ON ca.doc_id = p.a
       |  JOIN codes cb ON cb.doc_id = p.b AND cb.code = ca.code
       |  GROUP BY 1, 2)""".stripMargin

  private val prefixCtes: String = prefixCtesWith("TRUE")

  val prefixPairsSql: String = shingleCte + prefixCtes +
    """
      |SELECT i.a, i.b, i.c, sa.n AS na, sb.n AS nb,
      |  (i.c * 1000) // (sa.n + sb.n - i.c) AS jac_pm
      |FROM pinter i JOIN psz sa ON i.a = sa.doc_id
      |JOIN psz sb ON i.b = sb.doc_id
      |WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4
      |ORDER BY a, b""".stripMargin

  /** LSH RECALL AUDIT — the "are we missing duplicates?" number a dedup
    * pipeline cannot read from inside itself: the shingle-LSH path only
    * ever sees ITS candidates, so its false negatives are invisible to
    * every LSH-side metric. The AllPairs prefix join ([[prefixPairs]]) is
    * exact and complete at the same τ = 0.8, so the two pipelines
    * compose into an honest recall measurement: found = LSH candidates
    * verified ≥ τ (⊆ truth by construction — both sides verify the same
    * exact Jaccard), missed = truth ∖ found with its Jaccard range (are
    * the misses borderline 0.8s or smoking-gun 0.95s?). The Broder/MMDS
    * S-curve predicts recall 1 − (1 − 0.8⁴)² ≈ 0.65 for this 2-band ×
    * 4-row config at J = 0.8 — the audit measures it on the real corpus.
    *
    * Scale: one shingling pass feeds both sides; the LSH side is the
    * measured banded-join shape, the AllPairs side the measured
    * prefix-join shape; the compose is an anti-join on bounded pair
    * frames + three 1-row aggregates.
    */
  def recallAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // codes stays unpinned for the same ×100 unified-memory reason as
    // [[prefixPairs]], so every consumer below re-derives the corpus
    // shingling — the r17 restructure is about needing FEWER consumers:
    // the r16 shape ran the LSH and AllPairs pair pipelines end-to-end
    // independently (15 corpus re-derivations in the executed plan, each
    // a scan + shingle window + distinct), although both sides end with
    // the SAME candidate-pair intersection join against codes. Union the
    // two candidate sets with membership flags, verify through ONE shared
    // intersection join (the dominant stage), and pin only bounded frames
    // (per-doc sizes, the verified pair table) — guide §2.4/§2.3.
    val codes = shingleCodes(s, dir)
    val sizes = shingleSizes(codes).pin(true) // |docs| rows, bounded
    val cand = shinglePairsOf(codes)
      .select($"a", $"b", lit(1L).as("lsh"), lit(0L).as("pre"))
      .unionByName(prefixCandOf(codes, sizes)
        .select($"a", $"b", lit(0L).as("lsh"), lit(1L).as("pre")))
      .groupBy($"a", $"b").agg(max($"lsh").as("lsh"), max($"pre").as("pre"))
      .pin(true) // candidate-pair table; feeds the one intersection join
    // a candidate pair with zero shared shingles (band-fold collision)
    // drops out of the inner join — it could never pass the τ = 0.8
    // verification filter (c = 0 < (na+nb)·4/5 since na, nb ≥ 1)
    val scored = cand
      .join(codes.select($"doc_id".as("a"), $"code"), Seq("a"))
      .join(codes.select($"doc_id".as("b"), $"code"), Seq("b", "code"))
      .groupBy($"a", $"b", $"lsh", $"pre").agg(count(lit(1)).as("c"))
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .filter($"c" * 5L >= ($"na" + $"nb" - $"c") * 4L)
      .pin(true) // verified pairs; found, truth and missed all read it
    val found = scored.filter($"lsh" === 1L).select($"a", $"b")
    val truth = scored.filter($"pre" === 1L).select($"a", $"b",
      (($"c" * 1000L) / ($"na" + $"nb" - $"c")).cast("long").as("jac_pm"))
    val missed = truth.join(found, Seq("a", "b"), "left_anti")
    val tAgg = truth.agg(count(lit(1)).as("n_truth"))
    val fAgg = found.agg(count(lit(1)).as("n_found"))
    val mAgg = missed.agg(count(lit(1)).as("n_missed"),
      coalesce(min($"jac_pm"), lit(-1L)).as("missed_min_jac_pm"),
      coalesce(max($"jac_pm"), lit(-1L)).as("missed_max_jac_pm"))
    tAgg.crossJoin(broadcast(fAgg)).crossJoin(broadcast(mAgg))
      .select($"n_truth", $"n_found", $"n_missed",
        floor($"n_found" * 1000L / $"n_truth").cast("long").as("recall_pm"),
        $"missed_min_jac_pm", $"missed_max_jac_pm")
  }

  val recallAuditSql: String = shingleCte + shingleBandsCte +
    shingleInterCte + prefixCtes +
    """,
      |truth AS (
      |  SELECT i.a, i.b, (i.c * 1000) // (sa.n + sb.n - i.c) AS jac_pm
      |  FROM pinter i JOIN psz sa ON i.a = sa.doc_id
      |  JOIN psz sb ON i.b = sb.doc_id
      |  WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4),
      |found AS (
      |  SELECT i.a, i.b FROM inter i
      |  JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id
      |  WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4),
      |missed AS (
      |  SELECT t.a, t.b, t.jac_pm FROM truth t
      |  LEFT JOIN found f ON t.a = f.a AND t.b = f.b
      |  WHERE f.a IS NULL)
      |SELECT
      |  (SELECT count(*) FROM truth)::BIGINT AS n_truth,
      |  (SELECT count(*) FROM found)::BIGINT AS n_found,
      |  (SELECT count(*) FROM missed)::BIGINT AS n_missed,
      |  ((SELECT count(*) FROM found) * 1000
      |    // (SELECT count(*) FROM truth))::BIGINT AS recall_pm,
      |  coalesce((SELECT min(jac_pm) FROM missed), -1)::BIGINT
      |    AS missed_min_jac_pm,
      |  coalesce((SELECT max(jac_pm) FROM missed), -1)::BIGINT
      |    AS missed_max_jac_pm""".stripMargin

  /** SAMPLED LSH recall audit — the constant-cost form of [[recallAudit]]
    * (VERDICT r13 missing #4: the exact audit pays BOTH pair pipelines +
    * an anti-join, 26 s at the ×10 probe; a diagnostic that prices like
    * the thing it audits stops being run). Pairs are Bernoulli-sampled BY
    * THEIR MIN-id ENDPOINT through a hash stratum: a pair (a, b), a < b,
    * is audited iff h(a) ≡ 0 (mod S) with h(d) = (d mod 1000003)·131071
    * mod 1000003 (multiplicative mixing on a bounded domain — overflow-
    * safe int64 in BOTH engines at any doc_id; plain doc_id mod S would
    * alias the sharded corpora's nDocs-offset structure). Each truth pair
    * has exactly one min endpoint, so the sample is an unbiased 1/S pair
    * sample, and the stratum restriction is pushed INTO both candidate
    * joins (the AllPairs prefix join's a-side and the LSH bucket join's
    * left side), so per-bucket volume drops ×1/S — with S ∝ corpus the
    * pair-side cost is constant while the one shingling scan remains the
    * only corpus-linear term. Output: sampled truth/found/missed counts,
    * the recall-permille ESTIMATE, and its 95% binomial CI half-width
    * (normal approximation) in permille — the honest "this is an
    * estimate" surface the exact audit doesn't need. The binomial CI is
    * exact for the Bernoulli pair model but pairs sharing a min doc
    * sample TOGETHER (cluster sampling), so under per-doc pair skew it
    * understates — `ci_jack_pm` (VERDICT r14 #5) is the clustered
    * complement: a delete-one-group jackknife over 8 hash sub-strata of
    * the min endpoint (an independent mixing, so groups cut across the
    * sampling stratum). All pairs of a min doc land in one group, so
    * between-group variance carries the cluster effect the binomial CI
    * cannot see. Exact-integer until the final division: each
    * leave-one-group-out recall is an integer permille r⁻ⱼ =
    * ⌊1000(f−fⱼ)/(t−tⱼ)⌋, and Σ(G·r⁻ⱼ−Σr⁻)² is integer, so both engines
    * share one double division + sqrt (the statAnova float-fold lesson).
    * No new corpus scans: two ≤8-row group aggs over the already-pinned
    * truth/found frames.
    */
  def recallAuditSampled(s: SparkSession, dir: String,
      strata: Int = 8): DataFrame = {
    import s.implicits._
    val strat: Column => Column =
      d => (d % 1000003L) * 131071L % 1000003L % strata === 0L
    // same shared-intersection restructure as [[recallAudit]] (r17): one
    // candidate union with membership flags, one verification join, pins
    // only on bounded frames — both stratum-restricted candidate streams
    // keep the predicate pushed into their joins' min-endpoint side
    val codes = shingleCodes(s, dir) // unpinned, the prefixPairs rule
    val sizes = shingleSizes(codes).pin(true) // |docs| rows, bounded
    val cand = shinglePairsOf(codes, Some(strat))
      .select($"a", $"b", lit(1L).as("lsh"), lit(0L).as("pre"))
      .unionByName(prefixCandOf(codes, sizes, Some(strat))
        .select($"a", $"b", lit(0L).as("lsh"), lit(1L).as("pre")))
      .groupBy($"a", $"b").agg(max($"lsh").as("lsh"), max($"pre").as("pre"))
      .pin(true)
    val scored = cand
      .join(codes.select($"doc_id".as("a"), $"code"), Seq("a"))
      .join(codes.select($"doc_id".as("b"), $"code"), Seq("b", "code"))
      .groupBy($"a", $"b", $"lsh", $"pre").agg(count(lit(1)).as("c"))
      .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
      .filter($"c" * 5L >= ($"na" + $"nb" - $"c") * 4L)
      .pin(true)
    val found = scored.filter($"lsh" === 1L).select($"a", $"b")
    val truth = scored.filter($"pre" === 1L).select($"a", $"b",
      (($"c" * 1000L) / ($"na" + $"nb" - $"c")).cast("long").as("jac_pm"))
    val missed = truth.join(found, Seq("a", "b"), "left_anti")
    val tAgg = truth.agg(count(lit(1)).as("t"))
    val fAgg = found.agg(count(lit(1)).as("f"))
    val mAgg = missed.agg(count(lit(1)).as("m"))
    // jackknife groups: a SECOND, independent hash of the min endpoint
    // (different modulus/multiplier than the sampling stratum), mod 8
    val jgrp: Column => Column = d => d % 999983L * 92821L % 999983L % 8L
    val tg = truth.groupBy(jgrp($"a").as("g")).agg(count(lit(1)).as("tg"))
    val fg = found.groupBy(jgrp($"a").as("g")).agg(count(lit(1)).as("fg"))
    val rpm = tg.join(fg, Seq("g"), "left")
      .select($"g", $"tg", coalesce($"fg", lit(0L)).as("fg"))
      .crossJoin(broadcast(tAgg)).crossJoin(broadcast(fAgg))
      // t−tg ≥ 1 whenever ≥2 groups exist (t = Σ tg); greatest guards
      // only the G = 1 degenerate case, whose CI is forced to 0 below
      .select(floor(($"f" - $"fg") * 1000L / greatest($"t" - $"tg", lit(1L)))
        .cast("long").as("rpm"))
      .pin(true) // ≤8 rows; the mean agg + the deviation agg both read it
    val jstat = rpm.agg(count(lit(1)).as("gn"), sum($"rpm").as("s1"))
      .pin(true) // 1 row; read by the deviation agg and the final fold
    // aggregate-on-possibly-empty keeps the 1-row shape (a corpus with no
    // truth pairs must still emit the audit row, with CI 0)
    val dev = rpm.crossJoin(broadcast(jstat))
      .agg(coalesce(sum(($"gn" * $"rpm" - $"s1") * ($"gn" * $"rpm" - $"s1")),
        lit(0L)).as("ssq"))
    val jack = jstat.crossJoin(broadcast(dev))
      .select(when($"gn" >= 2L,
        floor(lit(1.96) * sqrt((($"gn" - 1L) * $"ssq").cast("double")
          / ($"gn" * $"gn" * $"gn").cast("double"))))
        .otherwise(lit(0L)).cast("long").as("jk"))
    tAgg.crossJoin(broadcast(fAgg)).crossJoin(broadcast(mAgg))
      .crossJoin(broadcast(jack))
      .select($"t".as("n_truth_sampled"), $"f".as("n_found_sampled"),
        $"m".as("n_missed_sampled"),
        floor($"f" * 1000L / greatest($"t", lit(1L))).cast("long")
          .as("recall_pm_est"),
        floor(lit(1960.0)
          * sqrt(($"f" * ($"t" - $"f")).cast("double"))
          / (greatest($"t", lit(1L)).cast("double")
            * sqrt(greatest($"t", lit(1L)).cast("double"))))
          .cast("long").as("ci_halfwidth_pm"),
        $"jk".as("ci_jack_pm"))
  }

  val recallAuditSampledSql: String = {
    val strat = "(%s %% 1000003) * 131071 %% 1000003 %% 8 = 0"
    // the stratum is pushed into BOTH candidate joins (r14 ADVICE): the
    // AllPairs prefix join's a-side AND the LSH bucket join's left
    // (min-endpoint) side — per-bucket volume drops ×1/S structurally,
    // not by optimizer grace
    shingleCte + shingleBandsCteWith(strat.format("l.doc_id")) +
      prefixCtesWith(strat.format("pa.doc_id")) +
      s""",
         |finter AS (
         |  SELECT p.a, p.b, count(*)::BIGINT AS c
         |  FROM pairs p JOIN codes ca ON ca.doc_id = p.a
         |  JOIN codes cb ON cb.doc_id = p.b AND cb.code = ca.code
         |  GROUP BY 1, 2),
         |found AS (
         |  SELECT i.a, i.b FROM finter i
         |  JOIN psz sa ON i.a = sa.doc_id JOIN psz sb ON i.b = sb.doc_id
         |  WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4),
         |truth AS (
         |  SELECT i.a, i.b FROM pinter i JOIN psz sa ON i.a = sa.doc_id
         |  JOIN psz sb ON i.b = sb.doc_id
         |  WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4),
         |missed AS (
         |  SELECT t.a, t.b FROM truth t
         |  LEFT JOIN found f ON t.a = f.a AND t.b = f.b
         |  WHERE f.a IS NULL),
         |st AS (SELECT
         |  (SELECT count(*) FROM truth)::BIGINT AS t,
         |  (SELECT count(*) FROM found)::BIGINT AS f,
         |  (SELECT count(*) FROM missed)::BIGINT AS m),
         |jg AS (
         |  SELECT a % 999983 * 92821 % 999983 % 8 AS g,
         |    count(*)::BIGINT AS tg
         |  FROM truth GROUP BY 1),
         |jf AS (
         |  SELECT a % 999983 * 92821 % 999983 % 8 AS g,
         |    count(*)::BIGINT AS fg
         |  FROM found GROUP BY 1),
         |jr AS (
         |  SELECT ((st.f - coalesce(jf.fg, 0)) * 1000
         |          // greatest(st.t - jg.tg, 1))::BIGINT AS rpm
         |  FROM jg LEFT JOIN jf USING (g), st),
         |js AS (SELECT count(*)::BIGINT AS gn,
         |              coalesce(sum(rpm), 0)::BIGINT AS s1 FROM jr),
         |jd AS (SELECT coalesce(sum((js.gn * jr.rpm - js.s1)
         |                         * (js.gn * jr.rpm - js.s1)), 0)::BIGINT
         |         AS ssq
         |       FROM jr, js),
         |jk AS (SELECT CASE WHEN js.gn >= 2 THEN
         |    floor(1.96 * sqrt(((js.gn - 1) * jd.ssq)::DOUBLE
         |      / (js.gn * js.gn * js.gn)::DOUBLE))::BIGINT
         |  ELSE 0 END AS jk FROM js, jd)
         |SELECT t AS n_truth_sampled, f AS n_found_sampled,
         |  m AS n_missed_sampled,
         |  (f * 1000 // greatest(t, 1))::BIGINT AS recall_pm_est,
         |  floor(1960.0 * sqrt((f * (t - f))::DOUBLE)
         |    / (greatest(t, 1)::DOUBLE * sqrt(greatest(t, 1)::DOUBLE)))::BIGINT
         |    AS ci_halfwidth_pm,
         |  jk AS ci_jack_pm
         |FROM st, jk""".stripMargin
  }

  /** LSH BANDING calibration (the (b, r) knob of the Broder/MMDS S-curve
    * P(candidate) = 1 − (1 − J^r)^b): the same 8 shingle-minhash perms
    * banded three ways — (2 bands × 4 rows, the shipped config), (4 × 2),
    * (8 × 1) — each measured for candidate volume, exact-Jaccard ≥ 0.5
    * true pairs among them, and precision in exact permille. More bands ×
    * shorter rows slides the S-curve left: recall (n_true) rises and
    * precision falls monotonically down the table — THE trade a pipeline
    * reads before fixing its banding at a new corpus, here as one query
    * instead of three ad-hoc reruns.
    *
    * Scale: signatures computed ONCE (checkpointed); each config is one
    * banded equi-join (bucketed candidates, never all-pairs) plus the
    * candidate-bounded intersection join of [[thresholdCurve]]; the three
    * 1-row stat frames union at the end. The b = 8, r = 1 config is the
    * deliberate stress end: single-perm buckets are the coarsest banding
    * whose bucket sizes still track true duplication, and its measured
    * precision documents why the shipped config bands wider.
    */
  def lshTuning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val codes = shingleCodes(s, dir).pin(true)
    val sigs = shingleMinhashOf(codes).pin(true)
    val sizes = shingleSizes(codes)
    val frames = Seq((2, 4), (4, 2), (8, 1)).map { case (b, r) =>
      val bands = (0 until b).map(i =>
        sigs.select($"doc_id", lit(i).as("band"),
          bandSig((i * r until (i + 1) * r).map(j => col(s"mh$j")))
            .as("sig")))
        .reduce(_ unionByName _)
      val cand = bands.select($"band", $"sig", $"doc_id".as("a"))
        .join(bands.select($"band", $"sig", $"doc_id".as("b")),
          Seq("band", "sig"))
        .filter($"a" < $"b").select($"a", $"b").distinct()
        .pin(true) // candidate count + the intersection join
      val inter = cand
        .join(codes.select($"doc_id".as("a"), $"code"), Seq("a"))
        .join(codes.select($"doc_id".as("b"), $"code"), Seq("b", "code"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
      cand.join(inter, Seq("a", "b"), "left")
        .select($"a", $"b", coalesce($"c", lit(0L)).as("c"))
        .join(sizes.select($"doc_id".as("a"), $"n".as("na")), Seq("a"))
        .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), Seq("b"))
        .select(round($"c" * 1.0 / ($"na" + $"nb" - $"c"), 4).as("jac"))
        .agg(count(lit(1)).as("n_candidates"),
          count(when($"jac" >= 0.5, lit(1))).as("n_true"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          $"n_candidates", $"n_true",
          floor(lit(1000L) * $"n_true" / greatest($"n_candidates", lit(1L)))
            .cast("long").as("precision_pm"))
    }
    frames.reduce(_ unionByName _).orderBy($"bands")
  }

  lazy val lshTuningSql: String = {
    def sig(i: Int, r: Int): String =
      (1 until r).foldLeft(s"mh${i * r}")((acc, j) =>
        s"(($acc) % $M * 131071 + mh${i * r + j}) % $M")
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(", ")
    val perConfig = Seq((2, 4), (4, 2), (8, 1)).map { case (b, r) =>
      val bandRows = (0 until b).map(i =>
        s"SELECT doc_id, $i AS band, ${sig(i, r)} AS sig FROM sigs")
        .mkString("\n  UNION ALL ")
      s""",
         |bands$b AS (
         |  $bandRows),
         |cand$b AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM bands$b l JOIN bands$b r
         |    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id),
         |inter$b AS (
         |  SELECT c.a, c.b, coalesce(i.c, 0)::BIGINT AS c
         |  FROM cand$b c LEFT JOIN (
         |    SELECT p.a, p.b, count(*)::BIGINT AS c
         |    FROM cand$b p
         |    JOIN codes ca ON ca.doc_id = p.a
         |    JOIN codes cb ON cb.doc_id = p.b AND cb.code = ca.code
         |    GROUP BY 1, 2) i ON c.a = i.a AND c.b = i.b),
         |stat$b AS (
         |  SELECT $b::BIGINT AS bands, $r::BIGINT AS rows_per_band,
         |    count(*)::BIGINT AS n_candidates,
         |    count(CASE WHEN round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) >= 0.5
         |          THEN 1 END)::BIGINT AS n_true
         |  FROM inter$b i
         |  JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id)""".stripMargin
    }.mkString
    shingleCte +
      s""", sigs AS (SELECT doc_id, $cols FROM codes GROUP BY doc_id),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM codes
         |       GROUP BY doc_id)""".stripMargin +
      perConfig +
      """
        |SELECT bands, rows_per_band, n_candidates, n_true,
        |  (1000 * n_true // greatest(n_candidates, 1))::BIGINT
        |    AS precision_pm
        |FROM (SELECT * FROM stat2 UNION ALL SELECT * FROM stat4
        |      UNION ALL SELECT * FROM stat8) t
        |ORDER BY bands""".stripMargin
  }

  /** Corpus PROFILE — the dataset-card row: doc/token/vocabulary counts,
    * doc-length distribution (min/median/max whitespace tokens; median is
    * the exact interpolated percentile, floored so an integer crosses
    * engines), language & source cardinalities, and the language
    * Herfindahl concentration in permille (Σ share_pm² / 1000 — the
    * integer surrogate for "how monolingual is this corpus", 1000 = one
    * language, → 0 = uniform over many). The one-row summary every
    * curation decision starts from.
    *
    * Scale: one pass over per-doc token counts (mergeable aggs + one
    * exact percentile on the |docs|-sized numeric column), one distinct
    * over tokens for the vocabulary, one |langs|-row aggregate for the
    * HHI; the three 1-row frames cross-join at the end (bounded
    * broadcasts).
    */
  def corpusProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perDoc = Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast("long").as("t"))
    val base = perDoc.agg(
      count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"),
      min($"t").as("min_doc_tokens"),
      floor(percentile($"t", lit(0.5))).cast("long").as("med_doc_tokens"),
      max($"t").as("max_doc_tokens"),
      count_distinct($"lang").as("n_langs"),
      count_distinct($"source").as("n_sources"))
    val vocab = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .agg(count_distinct($"w").as("n_terms"))
    val hhi = perDoc.groupBy($"lang").agg(count(lit(1)).as("nl"))
      .crossJoin(broadcast(perDoc.agg(count(lit(1)).as("nd"))))
      .select(floor($"nl" * 1000L / $"nd").cast("long").as("share_pm"))
      .agg(floor(sum($"share_pm" * $"share_pm") / 1000L).cast("long")
        .as("lang_hhi_pm"))
    base.crossJoin(broadcast(vocab)).crossJoin(broadcast(hhi))
  }

  val corpusProfileSql: String =
    """WITH perdoc AS (
      |  SELECT doc_id, lang, source,
      |    len(string_split(text, ' '))::BIGINT AS t
      |  FROM documents),
      |base AS (
      |  SELECT count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS n_tokens,
      |    min(t)::BIGINT AS min_doc_tokens,
      |    floor(quantile_cont(t, 0.5))::BIGINT AS med_doc_tokens,
      |    max(t)::BIGINT AS max_doc_tokens,
      |    count(DISTINCT lang)::BIGINT AS n_langs,
      |    count(DISTINCT source)::BIGINT AS n_sources
      |  FROM perdoc),
      |vocab AS (
      |  SELECT count(DISTINCT w)::BIGINT AS n_terms
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) z),
      |hhi AS (
      |  SELECT floor(sum(share_pm * share_pm) / 1000)::BIGINT
      |    AS lang_hhi_pm
      |  FROM (
      |    SELECT (count(*) * 1000 // (SELECT count(*) FROM perdoc))::BIGINT
      |      AS share_pm
      |    FROM perdoc GROUP BY lang) sh)
      |SELECT * FROM base CROSS JOIN vocab CROSS JOIN hhi""".stripMargin

  /** Connected components by alternating large-star / small-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round relinks every node toward the minimum
    * id in its neighborhood, which contracts path-shaped components
    * exponentially — O(log n) rounds regardless of graph diameter, where
    * plain min-label propagation needs O(diameter) rounds (a 10M-node
    * chain would take 10M Spark jobs; this takes ~25).
    *
    * Invariant: `edges` is always oriented (hi, lo) with hi > lo and no
    * self-loops, so the fixed point is a star forest where every non-root
    * carries one edge to its component's minimum node.
    *  - large-star(u): for every neighbor v > u, emit (v, m) where m =
    *    min(neighborhood(u) ∪ u) — preserves connectivity, strictly
    *    shrinks big endpoints toward the min;
    *  - small-star(u): for the smaller-side neighbors, emit (v, m) and
    *    (u, m) — re-centers each local star on its minimum.
    * Each half-round is one shuffle (groupBy min + join); convergence is
    * an exact set comparison of consecutive checkpointed edge frames.
    *
    * Returns the per-node assignment (doc_id, label) — label = component
    * minimum, isolated nodes label themselves — plus the round count the
    * caller can assert O(log n) bounds on.
    */
  def starContraction(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val s = nodes.sparkSession
    import s.implicits._
    var edges = pairs.filter($"a" =!= $"b")
      .select(greatest($"a", $"b").as("hi"), least($"a", $"b").as("lo"))
      .distinct().pin(true)
    var round = 0
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      // large-star over the symmetric adjacency
      val sym = edges.select($"hi".as("u"), $"lo".as("v"))
        .unionByName(edges.select($"lo".as("u"), $"hi".as("v")))
      val mins = sym.groupBy($"u")
        .agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      // NO distinct on the large-star emission (r17): small-star's min is
      // duplicate-insensitive and `next` ends in its own distinct, so the
      // across-u duplicate (v, m) pairs are harmless — the dedup cost a
      // full (hi, lo) exchange + aggregate per round, after which both
      // consumers re-exchanged by hi anyway; now the single hi exchange
      // is built once and reused by the groupBy and the join (guide §2.4)
      val large = sym.filter($"v" > $"u")
        .join(mins, Seq("u"))
        .select($"v".as("hi"), $"m".as("lo"))
      // small-star on the (hi, lo) orientation large-star guarantees
      val smins = large.groupBy($"hi").agg(min($"lo").as("m"))
      val next = large.join(smins, Seq("hi"))
        .select($"lo".as("hi"), $"m".as("lo"))
        .filter($"hi" =!= $"lo")
        .unionByName(smins.select($"hi", $"m".as("lo")))
        .distinct().pin(true)
      // Fixpoint test (r16): the alternating rounds reach their fixed
      // point exactly when the edge frame is a STAR FOREST — no node is
      // both a child (hi) and a parent (lo). (⇐: on a star forest both
      // half-rounds re-emit the same edges, shown by direct computation;
      // ⇒: a depth-2 chain h2 > x > l1 makes large-star re-point h2 at
      // min(N(x) ∪ x) < x, so the frame changes.) One early-exit
      // semi-join probe on the pinned frame replaces the old
      // count()+exceptAll set-equality pair — and fires one round
      // EARLIER: equality could only observe stability on the round
      // AFTER the star forest formed, paying two full no-op shuffle
      // half-rounds per call. This is the hot inner loop of every
      // contraction query (components, clusters, single-linkage, MSF).
      converged = next.select($"hi")
        .join(next.select($"lo".as("hi")), Seq("hi"), "left_semi")
        .isEmpty
      edges = next
      round += 1
    }
    // converging within the cap is a hard contract: a partially contracted
    // forest would silently disagree with the exact reachability oracle
    require(converged,
      s"star contraction did not converge within $round rounds")
    val labels = nodes.join(edges.select($"hi".as(nodes.columns.head),
        $"lo".as("label")), Seq(nodes.columns.head), "left")
      .select(col(nodes.columns.head),
        coalesce($"label", col(nodes.columns.head)).as("label"))
    (labels, round)
  }

  /** Near-dup CLUSTERING: connected components over the shingle-LSH pair
    * graph — the step a dedup pipeline runs after pair generation to pick
    * one canonical document per duplicate cluster. Components via
    * [[starContraction]] (O(log n) rounds, diameter-independent); the
    * oracle replays reachability as a DuckDB recursive CTE, so the labels
    * must be exactly the per-component minima.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id")
    // the unsorted pair frame: contraction re-shuffles immediately, so the
    // public query's presentation sort would be a wasted global exchange
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    labels.select($"doc_id", $"label".as("cluster"),
        ($"doc_id" === $"label").cast("int").as("is_canonical"))
      .orderBy($"doc_id")
  }

  val dedupClustersSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      s""",
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node)
         |SELECT node AS doc_id, min(m)::BIGINT AS cluster,
         |  CASE WHEN node = min(m) THEN 1 ELSE 0 END AS is_canonical
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
    }

  /** GROUP-AWARE k-fold assignment: folds are a hash of the near-dup
    * CLUSTER, not the document — the split discipline behind honest
    * cross-validation on web-scale text (Lee et al. ACL 2022 measured
    * how near-dup train/eval leakage inflates scores): any two near-dup
    * documents land in the SAME fold by construction, so no fold's eval
    * half sees paraphrases of another fold's train half. The per-doc
    * leakage-safe split already exists (`sample_leakage_split`); this is
    * its k-fold generalization, reporting per fold the doc count,
    * cluster count, and token mass — the balance readout that tells you
    * whether the cluster-size skew (one giant template family) broke
    * fold comparability. Fold = cluster·Knuth mod 2³¹ mod 5 (headroom:
    * cluster ids < 2³¹ keep the product exact in int64).
    *
    * Scale: rides [[starContraction]]'s cluster labels (O(log n) keyed
    * rounds); the assignment is a projection and the report one
    * fold-keyed aggregation. Nothing new shuffles beyond the clustering.
    */
  def groupKfold(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val folds = labels.select($"doc_id", $"label",
      ($"label" * 2654435761L % 2147483647L % k).as("fold"))
    val docs = Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("toks"))
    folds.join(docs, Seq("doc_id"))
      .groupBy($"fold")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"label").as("n_clusters"),
        sum($"toks").as("n_tokens"))
      .orderBy($"fold")
  }

  val groupKfoldSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      s""",
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
         |lab AS (SELECT node AS doc_id, min(m) AS label FROM reach
         |        GROUP BY node),
         |f AS (SELECT doc_id, label,
         |        label * 2654435761 % 2147483647 % 5 AS fold FROM lab),
         |t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS toks
         |      FROM documents)
         |SELECT fold::BIGINT AS fold, count(*)::BIGINT AS n_docs,
         |  count(DISTINCT label)::BIGINT AS n_clusters,
         |  sum(toks)::BIGINT AS n_tokens
         |FROM f JOIN t USING (doc_id) GROUP BY fold ORDER BY fold"""
        .stripMargin
    }

  /** Cluster PURITY audit: over the multi-member near-dup clusters, how
    * often the members agree on language — the cheap ground-truth proxy
    * for "is the banding merging unrelated documents" (true near-dups
    * share a language essentially always, so impure clusters localize
    * LSH false merges; the same audit runs against any trusted label).
    * One summary row: multi-member cluster count, fully-pure count,
    * member mass, and the member-weighted majority-label share in exact
    * permille.
    *
    * Scale: rides the [[starContraction]] labels; purity is two
    * mergeable aggregations on the cluster-keyed shuffle; singletons are
    * excluded (trivially pure — they would only dilute the signal).
    */
  def clusterPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val perCl = labels
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"),
        Seq("doc_id"))
      .groupBy($"label", $"lang").agg(count(lit(1)).as("cnt"))
      .groupBy($"label")
      .agg(sum($"cnt").as("size"), max($"cnt").as("maxcnt"))
      .filter($"size" >= 2L)
    perCl.agg(count(lit(1)).as("n_multi_clusters"),
      sum(when($"maxcnt" === $"size", 1L).otherwise(0L))
        .as("n_pure_clusters"),
      sum($"size").as("docs_in_multi"),
      floor(lit(1000L) * sum($"maxcnt") / sum($"size")).cast("long")
        .as("weighted_purity_pm"))
  }

  lazy val clusterPuritySql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      s""",
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
         |lab AS (SELECT node AS doc_id, min(m) AS label FROM reach
         |        GROUP BY node),
         |cl AS (
         |  SELECT lab.label, d.lang, count(*)::BIGINT AS cnt
         |  FROM lab JOIN documents d ON lab.doc_id = d.doc_id
         |  GROUP BY 1, 2),
         |pc AS (
         |  SELECT label, sum(cnt)::BIGINT AS size,
         |    max(cnt)::BIGINT AS maxcnt
         |  FROM cl GROUP BY label HAVING sum(cnt) >= 2)
         |SELECT count(*)::BIGINT AS n_multi_clusters,
         |  sum(CASE WHEN maxcnt = size THEN 1 ELSE 0 END)::BIGINT
         |    AS n_pure_clusters,
         |  sum(size)::BIGINT AS docs_in_multi,
         |  (1000 * sum(maxcnt) // sum(size))::BIGINT
         |    AS weighted_purity_pm
         |FROM pc""".stripMargin
    }

  /** LEAKAGE-SAFE train/eval split: assign documents to splits by a
    * deterministic hash of their near-dup CLUSTER label, never of the
    * doc_id — so a near-duplicate family can never straddle the split
    * boundary (hashing doc_ids leaks eval content into training through
    * its near-dups, the contamination [[decontaminate]] later has to
    * mop up; splitting by cluster prevents it by construction). ~80% of
    * clusters → train. Reports per split: docs, whitespace tokens, and
    * cluster counts; the cluster-disjointness is the contract the spec
    * asserts and the per-split cluster counts make auditable (they must
    * sum to the corpus total).
    *
    * Scale: cluster labels via [[starContraction]] (O(log n) rounds);
    * the split decision is a pure expression on the label; one
    * doc_id-keyed join to attach labels and one 2-row agg. This is the
    * split recipe of the dedup-aware pipelines (e.g. the eval-
    * decontamination discipline of GPT-3 appendix C onward), expressed
    * as a first-class operator.
    */
  def leakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val assigned = labels.select($"doc_id",
      when(($"label" * 52361L + 24001L) % M % 10L < 8L, "train")
        .otherwise("eval").as("split"), $"label")
    Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("t"))
      .join(assigned, Seq("doc_id"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"),
        count_distinct($"label").as("n_clusters"))
      .orderBy($"split")
  }

  lazy val leakageSafeSplitSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      s""",
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
         |lab AS (SELECT node AS doc_id, min(m) AS label FROM reach
         |        GROUP BY node),
         |sp AS (
         |  SELECT d.doc_id,
         |    CASE WHEN (lab.label * 52361 + 24001) % $M % 10 < 8
         |         THEN 'train' ELSE 'eval' END AS split,
         |    lab.label, len(string_split(d.text, ' '))::BIGINT AS t
         |  FROM documents d JOIN lab ON d.doc_id = lab.doc_id)
         |SELECT split, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS n_tokens,
         |  count(DISTINCT label)::BIGINT AS n_clusters
         |FROM sp GROUP BY split ORDER BY split""".stripMargin
    }

  /** Canonical-document SELECTION — the dedup *action* that follows
    * clustering: per near-dup cluster, keep the highest-quality member
    * (most words; doc_id breaks ties deterministically) and report the
    * survivor manifest (cluster, keep_id, keep_words, n_members). A real
    * pipeline materializes exactly this frame and anti-joins the corpus
    * against the non-survivors; [[dedupClusters]] only LABELS (its
    * canonical is the arbitrary per-component min id), this picks by
    * merit, which is what production dedup does (keep the longest /
    * best-scored copy, drop truncated mirrors).
    *
    * Scale: rides the same star-contraction labels; the quality join is
    * doc_id-keyed (no extra corpus pass — n_words is length arithmetic on
    * the already-read text), and the per-cluster argmax is one window +
    * one mergeable agg, both on the cluster-keyed shuffle. Cluster sizes
    * are near-dup groups — bounded small by construction, no skew risk.
    */
  def keepBest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val nw = Tables.documents(s, dir).select($"doc_id",
      (length($"text") - length(regexp_replace($"text", lit(" "), lit(""))) + 1)
        .cast("long").as("n_words"))
    labels.select($"doc_id", $"label".as("cluster"))
      .join(nw, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"cluster").orderBy($"n_words".desc, $"doc_id")))
      .groupBy($"cluster")
      .agg(
        min(when($"rk" === 1, $"doc_id")).as("keep_id"),
        min(when($"rk" === 1, $"n_words")).as("keep_words"),
        count(lit(1)).as("n_members"))
      .orderBy($"cluster")
  }

  val keepBestSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      """,
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach(node, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
        |lab AS (SELECT node AS doc_id, min(m)::BIGINT AS cluster
        |        FROM reach GROUP BY node),
        |nw AS (SELECT doc_id,
        |         (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
        |           AS n_words
        |       FROM documents),
        |rk AS (
        |  SELECT l.cluster, l.doc_id, nw.n_words,
        |    row_number() OVER (PARTITION BY l.cluster
        |      ORDER BY nw.n_words DESC, l.doc_id) AS rk
        |  FROM lab l JOIN nw USING (doc_id))
        |SELECT cluster,
        |  min(CASE WHEN rk = 1 THEN doc_id END)::BIGINT AS keep_id,
        |  min(CASE WHEN rk = 1 THEN n_words END)::BIGINT AS keep_words,
        |  count(*)::BIGINT AS n_members
        |FROM rk GROUP BY cluster ORDER BY cluster""".stripMargin
    }

  /** Duplicate-aware SOFT reweighting — the alternative dedup *action* to
    * hard removal ([[keepBest]]): instead of dropping near-duplicates,
    * weight every member of a duplicate cluster by 1/|cluster| so the
    * cluster contributes one document's worth of probability mass to
    * training (the "soft dedup" used when duplicates carry signal — e.g.
    * boilerplate-heavy but partially distinct mirrors — and hard removal
    * would lose the variation; cf. the sampling-weight treatment of
    * duplication in D4 / SoftDeDup-style curation). Singletons keep weight
    * 1000‰; a k-member cluster's members each get ⌊1000/k⌋‰ — integer
    * permille so the contract is bit-exact cross-engine.
    *
    * Scale: rides the same star-contraction labels as [[dedupClusters]]
    * (O(log n) bounded shuffles); sizes are one mergeable count on the
    * cluster-keyed shuffle and the weight join is cluster-keyed
    * (co-partitioned with the agg that produced it). Cluster sizes are
    * near-dup groups — bounded small by construction, no skew risk.
    */
  def softWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val sizes = labels.groupBy($"label".as("cluster"))
      .agg(count(lit(1)).as("n_members"))
    labels.select($"doc_id", $"label".as("cluster"))
      .join(sizes, Seq("cluster"))
      .select($"doc_id", $"cluster", $"n_members",
        floor(lit(1000L) / $"n_members").cast("long").as("weight_permille"))
      .orderBy($"doc_id")
  }

  val softWeightsSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      """,
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach(node, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
        |lab AS (SELECT node AS doc_id, min(m)::BIGINT AS cluster
        |        FROM reach GROUP BY node),
        |sz AS (SELECT cluster, count(*)::BIGINT AS n_members
        |       FROM lab GROUP BY cluster)
        |SELECT doc_id, cluster, n_members,
        |  (1000 // n_members)::BIGINT AS weight_permille
        |FROM lab JOIN sz USING (cluster) ORDER BY doc_id""".stripMargin
    }

  /** Effective dataset size under soft dedup — the composition of
    * [[softWeights]] with per-doc token counts: per language, raw token
    * mass vs the EFFECTIVE mass after 1/cluster-size reweighting (in exact
    * integer milli-tokens — permille weight × tokens), plus the permille
    * discount. This is the number a data-mixing recipe actually consumes:
    * "how many tokens is this language worth once duplication is
    * discounted" (the soft analogue of counting only keep-manifest
    * survivors), feeding straight into [[graft.operators.Sketches]]'
    * mixture/α-rebalance quotas.
    *
    * Scale: token counts are a length-arithmetic map (size(split) — no
    * explode, no shuffle); the weight join is doc_id-keyed; one final
    * per-language mergeable agg. The expensive part (cluster labels) is
    * the already-certified star contraction, computed once and shared.
    */
  def softTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = softWeights(s, dir)
      .select($"doc_id", $"weight_permille")
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .join(w, "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("raw_tokens"),
        sum($"n_tokens" * $"weight_permille").as("eff_tokens_milli"))
      .withColumn("discount_pm",
        floor($"eff_tokens_milli" / $"raw_tokens").cast("long"))
      .orderBy($"lang")
  }

  val softTokensSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      """,
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach(node, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
        |lab AS (SELECT node AS doc_id, min(m)::BIGINT AS cluster
        |        FROM reach GROUP BY node),
        |sz AS (SELECT cluster, count(*)::BIGINT AS n_members
        |       FROM lab GROUP BY cluster),
        |wt AS (SELECT doc_id, (1000 // n_members)::BIGINT AS w
        |       FROM lab JOIN sz USING (cluster)),
        |tk AS (SELECT doc_id, lang,
        |         len(string_split(text, ' '))::BIGINT AS n_tokens
        |       FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(n_tokens)::BIGINT AS raw_tokens,
        |  sum(n_tokens * w)::BIGINT AS eff_tokens_milli,
        |  floor(sum(n_tokens * w) / sum(n_tokens))::BIGINT AS discount_pm
        |FROM tk JOIN wt USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin
    }

  /** The END-TO-END curation verdict — one frame answering "does this
    * document go into the training set?", composing the three gates every
    * production pipeline runs in sequence: quality (the Gopher rule
    * battery), near-dup survivorship (this doc is its shingle-cluster's
    * merit keeper — most words, id tie-break), and benchmark
    * decontamination (no 3-word shingle shared with the held-out eval
    * split). Scope is the training corpus (source ≠ src0; the eval split
    * is never a training candidate). keep = quality ∧ keeper ∧ clean.
    *
    * This is the manifest a 100 TB run materializes once and anti-joins
    * everything else against; each component gate is independently
    * oracle-verified by its own query (text_gopher_rules, dedup_keep_best,
    * text_decontaminate), and this composition is verified end-to-end —
    * so a user can swap in any single stage without losing the certified
    * whole.
    *
    * Scale: the three component frames are each one aggregation over
    * already-justified shapes; the composition adds only doc_id-keyed
    * joins (co-partitioned after the first exchange). No new corpus pass:
    * quality and shingles read the same token stream the components read.
    */
  def keepManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val (labels, _) =
      starContraction(docs.select($"doc_id"), shinglePairsOf(shingleCodes(s, dir)))
    val nw = docs.select($"doc_id",
      (length($"text") - length(regexp_replace($"text", lit(" "), lit(""))) + 1)
        .cast("long").as("n_words"))
    val keeper = labels.select($"doc_id", $"label".as("cluster"))
      .join(nw, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"cluster").orderBy($"n_words".desc, $"doc_id")))
      .select($"doc_id", ($"rk" === 1).cast("int").as("is_keeper"))
    val quality = gopherRulesOf(s, dir)
      .select($"doc_id", $"keep".as("quality_keep"))
    decontaminateOf(s, dir).select($"doc_id", $"contaminated")
      .join(quality, Seq("doc_id"))
      .join(keeper, Seq("doc_id"))
      .select($"doc_id", $"quality_keep", $"is_keeper",
        $"contaminated".cast("int").as("contaminated"),
        ($"quality_keep" * $"is_keeper"
          * (lit(1) - $"contaminated")).cast("int").as("keep"))
      .orderBy($"doc_id")
  }

  /** Shared CTE chain ending in `man(doc_id, quality_keep, is_keeper,
    * contaminated, keep)` — the manifest frame, factored so the funnel
    * oracle composes the identical stage definitions.
    */
  private val keepManifestCtes: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      val stopList = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(w => s"'$w'").mkString(", ")
      s""",
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(node, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
         |lab AS (SELECT node AS doc_id, min(m)::BIGINT AS cluster
         |        FROM reach GROUP BY node),
         |nw AS (SELECT doc_id,
         |         (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
         |           AS n_words
         |       FROM documents),
         |kp AS (
         |  SELECT doc_id,
         |    CASE WHEN row_number() OVER (PARTITION BY cluster
         |      ORDER BY n_words DESC, doc_id) = 1 THEN 1 ELSE 0 END
         |      AS is_keeper
         |  FROM lab JOIN nw USING (doc_id)),
         |gw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |       FROM documents),
         |gagg AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_words,
         |    sum(length(w))::BIGINT AS sum_wlen,
         |    sum(CASE WHEN lower(w) <> upper(w) THEN 1 ELSE 0 END)::BIGINT
         |      AS alpha_words,
         |    count(DISTINCT CASE WHEN w IN ($stopList) THEN w END)::BIGINT
         |      AS stop_distinct,
         |    sum(((length(w) - length(replace(w, '#', '')))
         |       + (length(w) - length(replace(w, '...', ''))) // 3)::BIGINT)::BIGINT
         |      AS sym_hits
         |  FROM gw GROUP BY doc_id),
         |gq AS (
         |  SELECT doc_id,
         |    ((CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
         |     * (CASE WHEN round(sum_wlen * 1.0 / n_words, 3)
         |          BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)
         |     * (CASE WHEN round(alpha_words * 1.0 / n_words, 4) >= 0.8
         |          THEN 1 ELSE 0 END)
         |     * (CASE WHEN round(sym_hits * 1.0 / n_words, 4) <= 0.1
         |          THEN 1 ELSE 0 END)
         |     * (CASE WHEN stop_distinct >= 1 THEN 1 ELSE 0 END))::INT
         |      AS quality_keep
         |  FROM gagg),
         |ec AS (
         |  SELECT DISTINCT code FROM codes
         |  JOIN documents USING (doc_id) WHERE source = 'src0'),
         |train AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
         |hits AS (
         |  SELECT c.doc_id, count(*)::BIGINT AS n_shared
         |  FROM codes c JOIN train t ON c.doc_id = t.doc_id
         |  JOIN ec ON c.code = ec.code
         |  GROUP BY c.doc_id),
         |man AS (
         |  SELECT t.doc_id, gq.quality_keep, kp.is_keeper,
         |    (CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END)::INT
         |      AS contaminated,
         |    (gq.quality_keep * kp.is_keeper
         |     * (1 - CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END))::INT
         |      AS keep
         |  FROM train t
         |  JOIN gq ON t.doc_id = gq.doc_id
         |  JOIN kp ON t.doc_id = kp.doc_id
         |  LEFT JOIN hits h ON t.doc_id = h.doc_id)
         |""".stripMargin
    }

  val keepManifestSql: String = keepManifestCtes +
    """SELECT doc_id, quality_keep, is_keeper, contaminated, keep
      |FROM man ORDER BY doc_id""".stripMargin

  /** Stage-by-stage retention FUNNEL over the curation pipeline — the
    * monitoring table every production run publishes next to its keep
    * manifest: how many documents (and tokens) survive each successive
    * gate — corpus → train split → quality → dedup-keeper →
    * decontaminated — and how many each stage dropped. A stage suddenly
    * eating 40% of the corpus is the first sign a threshold or an
    * upstream regression needs attention; absolute drop counts are what
    * alerting thresholds attach to.
    *
    * Composes [[keepManifest]]'s gate columns (each independently
    * oracled) into cumulative survival: a doc is counted at every stage
    * up to the first gate it fails, with the gate order fixed as quality
    * → dedup → decontamination (the order production pipelines run them,
    * cheapest-per-doc first).
    *
    * Scale: one manifest join + one ≤5-group agg; the stage fan-out
    * (`explode(sequence(0, reach))`) happens on the ≤5-row aggregate,
    * not the corpus.
    */
  def stageFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tk = Tables.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
    val man = keepManifest(s, dir)
      .select($"doc_id", $"quality_keep", $"is_keeper", $"contaminated")
    val rch = tk.join(man, Seq("doc_id"), "left")
      .select($"n_tokens",
        when($"quality_keep".isNull, 0)
          .when($"quality_keep" === 0, 1)
          .when($"is_keeper" === 0, 2)
          .when($"contaminated" === 1, 3)
          .otherwise(4).as("reach"))
    val fun = rch.groupBy($"reach")
      .agg(count(lit(1)).as("nd"), sum($"n_tokens").as("nt"))
      .select(explode(sequence(lit(0), $"reach")).as("sid"), $"nd", $"nt")
      .groupBy($"sid")
      .agg(sum($"nd").as("n_docs"), sum($"nt").as("n_tokens"))
    fun // ≤5-row frame: the windowed lag is free
      .withColumn("dropped", coalesce(
        lag($"n_docs", 1).over(Window.orderBy($"sid")) - $"n_docs", lit(0L)))
      .select($"sid".cast("long").as("stage_idx"),
        when($"sid" === 0, "corpus").when($"sid" === 1, "train_split")
          .when($"sid" === 2, "quality").when($"sid" === 3, "dedup")
          .otherwise("decontaminated").as("stage"),
        $"n_docs", $"n_tokens", $"dropped")
      .orderBy($"stage_idx")
  }

  val stageFunnelSql: String = keepManifestCtes +
    """, tk AS (SELECT doc_id,
      |           len(string_split(text, ' '))::BIGINT AS n_tokens
      |         FROM documents),
      |rch AS (
      |  SELECT tk.n_tokens,
      |    CASE WHEN m.doc_id IS NULL THEN 0
      |         WHEN m.quality_keep = 0 THEN 1
      |         WHEN m.is_keeper = 0 THEN 2
      |         WHEN m.contaminated = 1 THEN 3
      |         ELSE 4 END AS reach
      |  FROM tk LEFT JOIN man m ON tk.doc_id = m.doc_id),
      |ragg AS (SELECT reach, count(*)::BIGINT AS nd,
      |           sum(n_tokens)::BIGINT AS nt
      |         FROM rch GROUP BY reach),
      |st AS (SELECT unnest(generate_series(0, reach)) AS sid, nd, nt
      |       FROM ragg),
      |fun AS (SELECT sid, sum(nd)::BIGINT AS n_docs,
      |          sum(nt)::BIGINT AS n_tokens
      |        FROM st GROUP BY sid)
      |SELECT sid::BIGINT AS stage_idx,
      |  CASE sid WHEN 0 THEN 'corpus' WHEN 1 THEN 'train_split'
      |    WHEN 2 THEN 'quality' WHEN 3 THEN 'dedup'
      |    ELSE 'decontaminated' END AS stage,
      |  n_docs, n_tokens,
      |  coalesce(lag(n_docs) OVER (ORDER BY sid) - n_docs, 0)::BIGINT
      |    AS dropped
      |FROM fun ORDER BY stage_idx""".stripMargin

  /** BPE tokenizer TRAINING (Sennrich et al. 2016), k greedy merge rounds
    * over the whitespace-token corpus — the tokenizer-fitting step of an
    * LLM data pipeline, run as a distributed iteration. Each round:
    * (1) count every adjacent token pair corpus-wide (one explode over
    * zipped array slices + one map-side-combinable count), (2) pick the
    * globally most frequent pair (freq desc, then lexicographic (a, b) —
    * a total order, so the winner is deterministic cross-engine),
    * (3) merge every occurrence left-greedily. The merge uses literal
    * `replace` over a `|tok|`-wrapped rendering of the doc, where the
    * pattern `|a||b|` consumes both delimiters — non-overlapping
    * left-to-right replacement is then EXACTLY greedy BPE ("a a a"
    * merges once), and DuckDB's `replace` has identical semantics, so
    * the oracle reproduces the merge bit-for-bit. Integer/string ops
    * only — no floats anywhere.
    *
    * Output: one row per round — (round, merge_a, merge_b, freq,
    * n_tokens) with n_tokens the corpus token count AFTER the merge
    * (wrapped rendering ⇒ tokens = bars/2, exact).
    *
    * Scale: per round one shuffle (the pair count), one 1-row
    * `TakeOrdered` winner (broadcast back — the winner never touches the
    * driver), one corpus-wide map. O(k) linear passes; the re-rendered
    * corpus is localCheckpointed each round because three consumers
    * (stats, next round's pairs, next round's merge) would otherwise
    * re-derive the whole merge chain multiply — the classic
    * multiply-consumed-frame trap.
    */
  def bpeTrain(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    bpeChain(s, dir, rounds)._2.orderBy($"round")
  }

  /** Shared BPE merge chain: runs `rounds` greedy merges and returns BOTH
    * the re-rendered corpus after the last merge (for [[bpeEncode]]) and
    * the per-round report frame (for [[bpeTrain]]). One chain, two
    * consumers — each round's corpus is already localCheckpointed, so
    * neither caller re-derives the merge history.
    */
  private def bpeChain(s: SparkSession, dir: String,
      rounds: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val bar = lit("|")
    var txt = Tables.documents(s, dir)
      .select($"doc_id",
        concat(bar, regexp_replace($"text", lit(" "), lit("||")), bar).as("t"))
      .pin(true)
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val arr = split(expr("substring(t, 2, length(t) - 2)"), "\\|\\|")
      val pairs = txt
        .select(explode(arrays_zip(
          slice(arr, lit(1), size(arr) - 1).as("a"),
          slice(arr, lit(2), size(arr) - 1).as("b"))).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
      val winner = pairs.groupBy($"a", $"b")
        .agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"a", $"b")
        .limit(1)
        .pin(true) // 1 row; reused by the merge AND the report
      txt = txt.crossJoin(broadcast(winner))
        .select($"doc_id",
          replace($"t",
            concat(bar, $"a", lit("||"), $"b", bar),
            concat(bar, $"a", lit("@"), $"b", bar)).as("t"))
        .pin(true)
      val nTokens = txt.agg(
        (sum(length($"t") - length(replace($"t", bar, lit("")))) / 2L)
          .cast("long").as("n_tokens"))
      val row = winner.crossJoin(nTokens)
        .select(lit(r.toLong).as("round"), $"a".as("merge_a"),
          $"b".as("merge_b"), $"freq", $"n_tokens")
      out = Some(out.map(_.unionByName(row)).getOrElse(row))
    }
    (txt, out.get)
  }

  /** PAIR-CACHE incremental BPE training — the scale form of [[bpeTrain]]
    * for realistic merge counts. The replace-form chain pays, per round,
    * a FULL corpus pair-count shuffle + a full corpus rewrite +
    * checkpoint: O(rounds × corpus), fine at rounds=3, unusable at 32k
    * merges. This form maintains state across rounds so each round costs
    * O(pairs adjacent to the merged pair), the classic fast-BPE cache
    * (cf. the pair-count caches in Sennrich's learn_bpe and
    * SentencePiece):
    *
    *  - a PAIR-COUNT table (a, b, freq) — built by ONE corpus shuffle up
    *    front, then updated only with per-round DELTAS: merging (a, b)
    *    changes only pairs overlapping an occurrence (−(x,a) −(a,b)
    *    −(b,y), +(x,a@b) +(a@b,y)), all derivable from the affected docs
    *    alone. The winner is a TakeOrdered(1) over this table — no
    *    corpus pass.
    *  - the corpus as BASE + OVERLAY: the immutable token arrays
    *    checkpointed once, plus a mods frame holding the CURRENT arrays
    *    of ever-rewritten docs. A round rewrites only docs containing
    *    the winner pair (left-greedy fold, exactly `replace`'s
    *    non-overlapping left-to-right semantics, including the
    *    fresh-merge rule for runs like "a a a"), so the per-round
    *    checkpoint is the touched-doc set, not the corpus.
    *  - token accounting incrementally: n_tokens decreases by exactly
    *    the number of non-overlapping replacements (Σ old−new lengths
    *    over affected docs).
    *
    * Output schema and values are IDENTICAL to [[bpeTrain]] (same winner
    * tie-break, same raw — overlap-inclusive — freq, same post-merge
    * n_tokens); BpeTrainSpec asserts the equivalence. The per-round
    * winner is a 1-row driver collect (it is the report row), the same
    * bounded-collect regime as the GlobalOrder offset table.
    */
  def bpeTrainIncremental(s: SparkSession, dir: String,
      rounds: Int = 3): DataFrame = {
    import s.implicits._
    def adjPairs(toks: Column): Column = arrays_zip(
      slice(toks, lit(1), size(toks) - 1).as("pa"),
      slice(toks, lit(2), size(toks) - 1).as("pb"))
    def pairCounts(toks: Column, sign: Long)(df: DataFrame): DataFrame = df
      .select(explode(adjPairs(toks)).as("p"))
      .select($"p.pa".as("a"), $"p.pb".as("b"))
      .groupBy($"a", $"b").agg((count(lit(1)) * sign).as("freq"))
    // Iterative-state discipline, settled by measurement (traces in
    // PLANS.md round 11): EVERY stateful frame is truncated with an
    // eager checkpoint each round, and the overlay upsert is
    // union + anti-join. Three rejected variants: (a) persist-only
    // chains where a frame references itself twice per round double the
    // PLAN each round — plan-string construction alone OOMed by round
    // 10; (b) persist with flatten-every-16 keeps plans linear but
    // cache eviction re-derives evicted rounds through the whole chain
    // (32 rounds: 324 s vs 22 s); (c) a full_outer+coalesce upsert —
    // despite constant data (~3.5k rows / 1 MB) its checkpoint job
    // DOUBLED per round (0.2 s → 69 s by round 24) while the
    // union+anti form stays flat at ~0.2 s/round on identical inputs.
    def pin(df: DataFrame, r: Int): DataFrame = {
      val _ = r
      df.pin(true)
    }
    val base = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("toks"))
      .pin(true)
    var pc = pairCounts($"toks", 1L)(base).pin(true)
    var mods = base.limit(0) // (doc_id, toks) overlay, initially empty
    var nTokens = base.agg(sum(size($"toks"))).head().getLong(0)
    val report = Seq.newBuilder[(Long, String, String, Long, Long)]
    for (r <- 1 to rounds) {
      val roundT0 = System.nanoTime()
      val win = pc.orderBy($"freq".desc, $"a", $"b").limit(1).collect()
      if (win.nonEmpty) {
        val (a, b, freq) =
          (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
        val ab = a + "@" + b
        val tWin = System.nanoTime()
        val cur = base.join(mods.select($"doc_id", $"toks".as("mt")),
            Seq("doc_id"), "left")
          .select($"doc_id", coalesce($"mt", $"toks").as("toks"))
        // left-greedy non-overlapping merge: a token merges into the top
        // of the output only if the top is a raw `a` (not itself freshly
        // merged this round) — exactly `replace`'s scan-continues-after-
        // the-replacement semantics. ONE checkpointed frame carries the
        // old AND new arrays of the affected docs: it feeds both delta
        // signs, the overlay update, and the replacement count.
        val aff = cur.filter(exists(adjPairs($"toks"),
            p => p.getField("pa") === a && p.getField("pb") === b))
          .select($"doc_id", $"toks", aggregate(
            $"toks",
            struct(array().cast("array<string>").as("out"),
              lit(false).as("fresh")),
            (acc, t) => {
              val out = acc.getField("out")
              val merge = !acc.getField("fresh") && size(out) > 0 &&
                element_at(out, -1) === a && t === b
              struct(
                when(merge, concat(slice(out, lit(1), size(out) - 1),
                    array(lit(ab))))
                  .otherwise(concat(out, array(t))).as("out"),
                merge.as("fresh"))
            },
            acc => acc.getField("out")).as("ntoks"))
          .pin(true)
        val tAff = System.nanoTime()
        val nRepl = aff.agg(sum(size($"toks") - size($"ntoks")))
          .head().getLong(0)
        val tRepl = System.nanoTime()
        nTokens -= nRepl
        val prevPc = pc
        val prevMods = mods
        pc = pin(pc.unionByName(pairCounts($"toks", -1L)(aff))
          .unionByName(pairCounts($"ntoks", 1L)(aff))
          .groupBy($"a", $"b").agg(sum($"freq").as("freq"))
          .filter($"freq" > 0), r)
        val tPc = System.nanoTime()
        // overlay upsert: rewritten docs replace their previous entry
        mods = pin(aff.select($"doc_id", $"ntoks".as("toks"))
          .unionByName(mods.join(aff.select($"doc_id"), Seq("doc_id"),
            "left_anti")), r)
        // the eager checkpoints above already materialized the new state
        val _ = (prevPc, prevMods)
        if (sys.env.contains("GRAFT_BPE_TRACE")) {
          val stats = mods.agg(count(lit(1)), sum(size($"toks")),
            sum(aggregate($"toks", lit(0L), (z, t) => z + length(t))))
            .head()
          println(s"[bpe] round=$r freq=$freq nRepl=$nRepl " +
            s"ms=${(System.nanoTime() - roundT0) / 1000000} " +
            s"winMs=${(tWin - roundT0) / 1000000} " +
            s"affMs=${(tAff - tWin) / 1000000} " +
            s"replMs=${(tRepl - tAff) / 1000000} " +
            s"pcMs=${(tPc - tRepl) / 1000000} " +
            s"modsMs=${(System.nanoTime() - tPc) / 1000000} " +
            s"modsRows=${stats.getLong(0)} modsToks=${stats.getLong(1)} " +
            s"modsChars=${stats.getLong(2)} " +
            s"modsParts=${mods.rdd.getNumPartitions} " +
            s"pcParts=${pc.rdd.getNumPartitions}")
        }
        report += ((r.toLong, a, b, freq, nTokens))
      }
    }
    report.result()
      .toDF("round", "merge_a", "merge_b", "freq", "n_tokens")
      .orderBy($"round")
  }

  /** BPE tokenizer APPLICATION: encode every document with the 3 merges
    * [[bpeTrain]] learns and report the per-doc token accounting —
    * whitespace tokens in, BPE tokens out, merges applied. This is the
    * tokenize step every pretraining pipeline runs after fitting: the
    * budget per document (and the compression the merges buy) is exactly
    * what sequence packing and cost estimation consume downstream.
    * Same exact cross-engine merge semantics as training (literal
    * `replace` over the bar-wrapped rendering), so counts are bit-exact.
    *
    * Scale: the chain is O(rounds) linear corpus passes (see
    * [[bpeTrain]]); the encode itself adds one length-arithmetic map and
    * one doc_id-keyed join against the raw corpus — at real scale the
    * merge table is a broadcast list applied in one pass, which is
    * exactly what the chain's per-round broadcast winner already does.
    */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val txt = bpeChain(s, dir, 3)._1
    val ws = Tables.documents(s, dir).select($"doc_id",
      (length($"text") - length(replace($"text", lit(" "), lit(""))) + 1L)
        .cast("long").as("n_ws"))
    txt
      .select($"doc_id",
        expr("(length(t) - length(replace(t, '|', ''))) div 2").as("n_bpe"))
      .join(ws, "doc_id")
      .select($"doc_id", $"n_ws", $"n_bpe",
        ($"n_ws" - $"n_bpe").as("n_merged"))
      .orderBy($"doc_id")
  }

  /** The d0→d3 merge-chain CTEs shared by [[bpeTrainSql]] and
    * [[bpeEncodeSql]] — one definition so the oracle's merge semantics
    * can never drift between the two gates.
    */
  private val bpeChainCtes: String = {
    def roundCtes(r: Int): String =
      s""",
         |p$r AS (
         |  SELECT l[i.i] AS a, l[i.i+1] AS b
         |  FROM (SELECT doc_id, string_split(substr(t, 2, length(t)-2), '||') AS l
         |        FROM d${r - 1}) s,
         |       LATERAL (SELECT unnest(range(1, len(s.l))) AS i) i),
         |w$r AS (SELECT a, b, count(*)::BIGINT AS freq FROM p$r
         |        GROUP BY a, b ORDER BY freq DESC, a, b LIMIT 1),
         |d$r AS (SELECT doc_id,
         |          replace(t, '|' || w.a || '||' || w.b || '|',
         |                     '|' || w.a || '@' || w.b || '|') AS t
         |        FROM d${r - 1}, w$r w),
         |s$r AS (SELECT sum((length(t) - length(replace(t,'|','')))//2)::BIGINT AS n
         |        FROM d$r)""".stripMargin
    """WITH d0 AS (SELECT doc_id, '|' || replace(text, ' ', '||') || '|' AS t
      |            FROM documents)""".stripMargin +
      (1 to 3).map(roundCtes).mkString
  }

  val bpeEncodeSql: String = bpeChainCtes +
    """
      |SELECT d.doc_id,
      |  (length(doc.text) - length(replace(doc.text, ' ', '')) + 1)::BIGINT
      |    AS n_ws,
      |  ((length(d.t) - length(replace(d.t, '|', ''))) // 2)::BIGINT AS n_bpe,
      |  ((length(doc.text) - length(replace(doc.text, ' ', '')) + 1)
      |   - (length(d.t) - length(replace(d.t, '|', ''))) // 2)::BIGINT
      |    AS n_merged
      |FROM d3 d JOIN documents doc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  val bpeTrainSql: String = bpeChainCtes +
      """
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS round, a AS merge_a, b AS merge_b, freq,
        |         (SELECT n FROM s1) AS n_tokens FROM w1
        |  UNION ALL
        |  SELECT 2::BIGINT, a, b, freq, (SELECT n FROM s2) FROM w2
        |  UNION ALL
        |  SELECT 3::BIGINT, a, b, freq, (SELECT n FROM s3) FROM w3)
        |ORDER BY round""".stripMargin

  /** PageRank over the minhash near-dup graph — the Pregel-style iterative
    * graph op (Page et al. 1999; used in practice as a document-quality /
    * centrality feature over dedup and link graphs in pretraining
    * pipelines). Nodes = all docs, edges = the LSH candidate pairs (both
    * directions); k power-iteration rounds in FIXED-POINT integer
    * arithmetic: rank scaled by 10^6, damping 85/100, every division an
    * integer `div` — both engines compute bit-identical ranks (floor-div
    * ≡ DuckDB `//` on the non-negative domain), so the oracle is an exact
    * hash gate, not a tolerance compare. Dangling/singleton docs hold the
    * teleport mass 150000 (= 0.15 × 10^6); mass lost to floors is the
    * standard fixed-point tradeoff and identical cross-engine.
    *
    * Scale: the canonical BSP shape — per iteration one join of edges
    * against the rank frame (both hash-partitioned on src), one map-side
    * combinable contribution sum keyed by dst, one left join back to
    * nodes. Edges + degrees are computed ONCE and localCheckpointed (every
    * iteration re-reads them — the multiply-consumed-frame rule); the rank
    * frame itself is consumed once per round, so it stays lazy and the
    * whole k-round recursion is one DAG. At real scale this is exactly
    * GraphX/Pregel's data layout: partition edges by src, ship ranks to
    * edges, aggregate messages by dst.
    */
  def pageRank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    val pairs = minhashCandidates(s, dir).pin(true) // union reads it twice
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionByName(pairs.select($"b".as("src"), $"a".as("dst")))
      .pin(true) // re-joined every round (2 narrow columns)
    // fold the out-degree INTO the rank frame (r17; was folded into the
    // edge list): the degree divides the SOURCE's rank, so it can ride
    // the |V|-row rank frame through each round's join instead of being
    // duplicated onto every out-edge — the per-round edge exchange drops
    // a column of |E| longs and the setup pays a |V|-row join instead of
    // re-joining the full |E|-row edge frame against deg (guide §2.3:
    // shuffle keys and small metadata, not per-edge copies).
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    val nodes = Tables.documents(s, dir).select($"doc_id")
      .join(deg.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"d", lit(1L)).as("d"))
      .pin(true) // re-read every round (rank left-join base, degree inline)
    var r = nodes.select($"doc_id", $"d", lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.withColumnRenamed("doc_id", "src"), "src")
        .select($"dst".as("doc_id"), expr("r div d").as("c"))
        .groupBy($"doc_id").agg(sum($"c").as("s"))
      r = nodes.join(contrib, Seq("doc_id"), "left")
        .select($"doc_id", $"d",
          (lit(150000L) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
    }
    r.select($"doc_id", $"r".as("rank")).orderBy($"doc_id")
  }

  val pageRankSql: String = {
    def iterCte(k: Int): String =
      s""",
         |r$k AS (
         |  SELECT n.doc_id,
         |    (150000 + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS doc_id, sum(r.r // deg.d)::BIGINT AS s
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.doc_id
         |                 JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) c ON n.doc_id = c.doc_id)""".stripMargin
    minhashPairsCte +
      """, nodes AS (SELECT doc_id FROM documents),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
        |r0 AS (SELECT doc_id, 1000000::BIGINT AS r FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT doc_id, r AS rank FROM r3 ORDER BY doc_id"
  }

  /** Personalized PageRank (Haveliwala, WWW'02; the push/seed-restart
    * form every "find documents related to THIS set" expansion uses —
    * seed-set expansion over the near-dup graph is how a curation
    * pipeline grows a topic slice from a few exemplars). Identical BSP
    * loop, fixed-point arithmetic, and edge layout as [[pageRank]]; the
    * ONE change is the teleport vector: mass restarts only at the seed
    * set (here the deterministic ~1% slice doc_id ≡ 0 mod 97), so rank
    * measures proximity to the seeds instead of global centrality —
    * non-seed docs hold rank 0 until contribution mass reaches them,
    * and anything outside the seeds' components stays exactly 0 (the
    * locality that makes PPR the scalable choice: mass touches only
    * the seeds' neighborhoods, however big the graph).
    *
    * Output: the top-20 ranked docs (rank desc, doc_id) with their seed
    * flag — the expansion list, seeds naturally at the top.
    */
  /** The shared seed-restart BSP loop of [[pprRank]], [[pprRankGroups]]
    * and [[pageRankGroups]]: `nodes0` carries (v, seed), `pairs` the
    * undirected edge list (a, b); returns the FULL (v, seed, rank) frame.
    * With seed = true on every node this is exactly plain PageRank
    * (uniform init 10^6, uniform teleport 150000); with a seed subset it
    * is Haveliwala PPR. [[pprLoop]] layers the top-20 readout on top.
    */
  private def pageRankBsp(nodes0: DataFrame, pairs0: DataFrame,
      iters: Int): DataFrame = {
    val s = nodes0.sparkSession
    import s.implicits._
    val pairs = pairs0.pin(true) // union reads it twice
    val edges = pairs.select($"a".as("src"), $"b".as("dst"))
      .unionByName(pairs.select($"b".as("src"), $"a".as("dst")))
      .pin(true) // re-joined every round (2 narrow columns)
    // degree folded into the |V|-row node/rank frame, not onto every
    // out-edge — same move as [[pageRank]] (r17): narrower per-round edge
    // exchange, |V|-sized setup join instead of |E|-sized
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    val nodes = nodes0
      .join(deg.withColumnRenamed("src", "v"), Seq("v"), "left")
      .select($"v", $"seed", coalesce($"d", lit(1L)).as("d"))
      .pin(true) // re-read every round (rank join base, degree inline)
    var r = nodes.select($"v", $"d",
      when($"seed", 1000000L).otherwise(0L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.withColumnRenamed("v", "src"), "src")
        .select($"dst".as("v"), expr("r div d").as("c"))
        .groupBy($"v").agg(sum($"c").as("s"))
      r = nodes.join(contrib, Seq("v"), "left")
        .select($"v", $"seed", $"d",
          (when($"seed", 150000L).otherwise(0L)
            + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
    }
    r.select($"v", $"seed", $"r".as("rank"))
  }

  private def pprLoop(nodes0: DataFrame, pairs0: DataFrame,
      iters: Int): DataFrame =
    pageRankBsp(nodes0, pairs0, iters)
      .orderBy(col("rank").desc, col("v")).limit(20)

  def pprRank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import s.implicits._
    pprLoop(
      Tables.documents(s, dir)
        .select($"doc_id".as("v"), ($"doc_id" % 97L === 0L).as("seed")),
      minhashCandidates(s, dir), iters)
      .withColumnRenamed("v", "doc_id")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): plain
    * PageRank over the word CO-OCCURRENCE graph — nodes are terms, edges
    * connect terms co-occurring within a 3-token window (the
    * [[cooccurLift]] pair construction, self-pairs excluded) with
    * support ≥ 5, unweighted as in the original paper. The top-ranked
    * terms are the corpus's keyword vocabulary: centrality in the
    * co-occurrence graph, not raw frequency (a frequent term with a
    * narrow context ranks below a moderately frequent hub — the property
    * that made TextRank the default non-learned keyword extractor).
    * Same fixed-point integer BSP as [[pageRank]] via the shared
    * [[pageRankBsp]] (seed = true everywhere ≡ uniform teleport), so the
    * oracle is an exact hash gate.
    *
    * Scale: one corpus window pass emits the pairs; the support-≥5
    * filter bounds the graph by the collocation vocabulary (the
    * text_cooccur_lift measured shape — O(window·tokens) emit, keyed
    * aggs); the 3 BSP rounds are joins over the vocabulary-bounded edge
    * frame, never the corpus.
    */
  def textRankTerms(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
    val edges = toks
      .withColumn("w1", lead($"w", 1).over(dw))
      .withColumn("w2", lead($"w", 2).over(dw))
      .withColumn("w3", lead($"w", 3).over(dw))
      .select($"w", explode(array($"w1", $"w2", $"w3")).as("x"))
      .filter($"x".isNotNull && $"w" =!= $"x")
      .select(least($"w", $"x").as("a"), greatest($"w", $"x").as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 5L)
      .select($"a", $"b")
      .pin(true) // node derivation + both union branches of the BSP
    val nodes = edges.select($"a".as("v"))
      .unionByName(edges.select($"b".as("v"))).distinct()
    pageRankBsp(nodes.select($"v", lit(true).as("seed")), edges, iters)
      .select($"v".as("term"), $"rank")
      .orderBy($"rank".desc, $"term").limit(20)
  }

  val textRankTermsSql: String = {
    def iterCte(k: Int): String =
      s""",
         |r$k AS (
         |  SELECT n.v,
         |    (150000 + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS v, sum(r.r // deg.d)::BIGINT AS s
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.v
         |                 JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) c ON n.v = c.v)""".stripMargin
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |ld AS (
      |  SELECT w, lead(w, 1) OVER dw AS w1, lead(w, 2) OVER dw AS w2,
      |         lead(w, 3) OVER dw AS w3
      |  FROM toks WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |prs AS (
      |  SELECT least(w, x) AS a, greatest(w, x) AS b FROM (
      |    SELECT w, unnest([w1, w2, w3]) AS x FROM ld) z
      |  WHERE x IS NOT NULL AND w <> x),
      |e AS (SELECT a, b FROM prs GROUP BY a, b HAVING count(*) >= 5),
      |nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e),
      |edges AS (SELECT a AS src, b AS dst FROM e
      |          UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
      |r0 AS (SELECT v, 1000000::BIGINT AS r FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT v AS term, r AS rank FROM r3 " +
      "ORDER BY rank DESC, term LIMIT 20"
  }

  /** [[pprRank]] on the CONTRACTED group graph — the production form
    * (the doc-level loop is the oracle-exact per-document surface, but
    * ScalingBench measured both doc-level BSP loops at ×27–28 wall for
    * ×10 docs: the clique-structured doc graph's ~87M-edge checkpointed
    * adjacency saturates local unified memory, the same degeneracy that
    * moved triangles/LPA/ANF/MST to groups). Nodes are signature groups
    * (gid = min member doc_id), seeds the gid ≡ 0 mod 97 slice, and the
    * expansion list reads "which duplicate FAMILIES are near the seed
    * families" — the cluster-level answer a curation pipeline acts on.
    */
  def pprRankGroups(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import s.implicits._
    pprLoop(
      groupFrame(s, dir)
        .select($"gid".as("v"), ($"gid" % 97L === 0L).as("seed")),
      groupPairsOf(s, dir), iters)
      .withColumnRenamed("v", "gid")
  }

  /** [[pageRank]] on the CONTRACTED group graph — the production plain
    * PageRank (VERDICT r13 #1: the doc-level BSP measured ×28 wall at
    * ×10 docs because the clique-structured near-dup doc graph's
    * checkpointed adjacency grows ~quadratically in family width; its
    * PPR twin's contracted sibling [[pprRankGroups]] measured FLAT).
    * Same fixed-point arithmetic and per-round plan as [[pageRank]] via
    * the shared [[pageRankBsp]] with every node a seed (uniform init +
    * uniform teleport ≡ plain PageRank); nodes are signature groups
    * (gid = min member doc_id), so rank reads "how central is this
    * duplicate FAMILY in the near-dup graph" — the form a curation
    * pipeline ranks clusters by. The doc-level [[pageRank]] stays as the
    * oracle-exact per-document surface.
    */
  def pageRankGroups(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import s.implicits._
    pageRankBsp(
      groupFrame(s, dir).select($"gid".as("v"), lit(true).as("seed")),
      groupPairsOf(s, dir), iters)
      .select($"v".as("gid"), $"rank").orderBy($"gid")
  }

  // lazy: groupGraphCte is declared later in the object
  lazy val pageRankGroupsSql: String = {
    def iterCte(k: Int): String =
      s""",
         |r$k AS (
         |  SELECT n.gid,
         |    (150000 + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS gid, sum(r.r // deg.d)::BIGINT AS s
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.gid
         |                 JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) c ON n.gid = c.gid)""".stripMargin
    groupGraphCte +
      """, nodes AS (SELECT gid FROM g),
        |edges AS (SELECT a AS src, b AS dst FROM gp
        |          UNION ALL SELECT b, a FROM gp),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
        |r0 AS (SELECT gid, 1000000::BIGINT AS r FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT gid, r AS rank FROM r3 ORDER BY gid"
  }

  // lazy: groupGraphCte is declared later in the object (initialization
  // order), same reason sqSpearmanSql is lazy in Similarity
  lazy val pprRankGroupsSql: String = {
    def iterCte(k: Int): String =
      s""",
         |p$k AS (
         |  SELECT n.gid, n.seed,
         |    (CASE WHEN n.seed THEN 150000 ELSE 0 END
         |     + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS gid, sum(r.r // deg.d)::BIGINT AS s
         |    FROM edges e JOIN p${k - 1} r ON e.src = r.gid
         |                 JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) c ON n.gid = c.gid)""".stripMargin
    groupGraphCte +
      """, nodes AS (SELECT gid, gid % 97 = 0 AS seed FROM g),
        |edges AS (SELECT a AS src, b AS dst FROM gp
        |          UNION ALL SELECT b, a FROM gp),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
        |p0 AS (SELECT gid, seed,
        |         (CASE WHEN seed THEN 1000000 ELSE 0 END)::BIGINT AS r
        |       FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT gid, seed, r AS rank FROM p3 " +
      "ORDER BY rank DESC, gid LIMIT 20"
  }

  val pprRankSql: String = {
    def iterCte(k: Int): String =
      s""",
         |p$k AS (
         |  SELECT n.doc_id, n.seed,
         |    (CASE WHEN n.seed THEN 150000 ELSE 0 END
         |     + (85 * COALESCE(c.s, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS doc_id, sum(r.r // deg.d)::BIGINT AS s
         |    FROM edges e JOIN p${k - 1} r ON e.src = r.doc_id
         |                 JOIN deg ON deg.src = e.src
         |    GROUP BY e.dst) c ON n.doc_id = c.doc_id)""".stripMargin
    minhashPairsCte +
      """, nodes AS (SELECT doc_id, doc_id % 97 = 0 AS seed
        |            FROM documents),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY src),
        |p0 AS (SELECT doc_id, seed,
        |         (CASE WHEN seed THEN 1000000 ELSE 0 END)::BIGINT AS r
        |       FROM nodes)""".stripMargin +
      (1 to 3).map(iterCte).mkString +
      "\nSELECT doc_id, seed, r AS rank FROM p3 " +
      "ORDER BY rank DESC, doc_id LIMIT 20"
  }

  /** Triangle counting over the minhash near-dup graph (node-iterator++ /
    * MPS degree orientation — Suri & Vassilvitskii 2011, the MapReduce
    * formulation): per doc, the number of triangles it belongs to — the
    * local-density signal that separates template/boilerplate families
    * (clique-like, high count) from chance LSH collisions (count 0).
    *
    * The algorithm IS the scale story: every edge is oriented from its
    * lower-(degree, id) endpoint to its higher one, wedges are built only
    * between OUT-neighbors of the shared low-degree center, and one join
    * against the oriented edge list closes them. Out-degree under this
    * orientation is O(√m) even for a hub vertex, so wedge volume is
    * O(m^1.5) worst-case instead of the Σd(v)² blow-up a star vertex
    * causes under naive id-orientation — this is the standard distributed
    * triangle algorithm at any scale. Because the closing edge {u,w} gets
    * the SAME orientation rule, wedge order ((du,u) < (dw,w)) aligns with
    * it and the close is a single equi-join, no per-row normalization.
    * Pure integer compares; each triangle is found exactly once (from its
    * unique lowest-(degree,id) vertex), so the oracle is an exact hash
    * gate.
    */
  /** Group-contracted near-dup graph: edges (a, b), a < b, between
    * identical-signature GROUPS, not documents. The doc-level near-dup
    * graph is clique-structured by construction (every member of an
    * identical-signature group pairs with every other) and graph
    * algorithms over cliques are degenerate AND super-linear: measured at
    * sf0.1 the doc-level wedge join emitted ~4·10⁹ rows, filled the disk
    * and killed the SparkContext after 400 s. Groups collapse each clique
    * to one node (sf0.1: 5000 docs → 1048 groups, 4.36M doc pairs → 12k
    * group edges, max degree 83), leaving the informative structure at a
    * size that scales with content diversity instead of duplication
    * volume. Shared by [[triangles]] and [[commonNeighbors]].
    */
  /** Signature-group node frame (s0, s1, gid), checkpointed — the
    * contracted graph's vertex set (one node per identical-signature
    * group, gid = min member doc_id), shared by [[groupPairsOf]] and
    * [[componentSizes]].
    */
  private[operators] def groupFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bs = minhashOf(s, dir).select($"doc_id",
      bandSig((0 until 4).map(i => col(s"mh$i"))).as("s0"),
      bandSig((4 until 8).map(i => col(s"mh$i"))).as("s1"))
    bs.groupBy($"s0", $"s1").agg(min($"doc_id").as("gid"))
      .pin(true) // both sides of both band joins
  }

  /** Edges of the contracted graph from an already-built group frame. */
  private def groupPairsFromG(g: DataFrame): DataFrame = {
    val s = g.sparkSession
    import s.implicits._
    def bandEdges(c: String): DataFrame =
      g.select(col(c).as("k"), $"gid".as("a"))
        .join(g.select(col(c).as("k"), $"gid".as("b")), Seq("k"))
        .filter($"a" < $"b").select($"a", $"b")
    bandEdges("s0").unionByName(bandEdges("s1")).distinct()
  }

  private[operators] def groupPairsOf(s: SparkSession, dir: String): DataFrame =
    groupPairsFromG(groupFrame(s, dir))

  /** Component-size histogram of the contracted near-dup graph: how many
    * connected components have exactly k signature groups — the
    * macro-structure readout (is duplication a sea of small families or
    * one giant percolated blob?) a pipeline checks BEFORE trusting
    * cluster-level dedup actions; a giant component here is the signal
    * that banding parameters percolated (the 16-bit simhash failure mode,
    * measured in PLANS.md) and cluster-keeper logic would nuke unrelated
    * content. Singleton groups (no edges) are size-1 components — the
    * histogram conserves the vertex set.
    *
    * Scale: components via the same large-star/small-star contraction as
    * [[dedupClusters]] (O(log n) rounds on the contracted graph), then
    * two |nodes|-bounded aggs. Oracle: reachability as a recursive CTE.
    */
  def componentSizes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = groupFrame(s, dir)
    val (labels, _) = starContraction(
      g.select($"gid"), groupPairsFromG(g))
    labels.groupBy($"label").agg(count(lit(1)).as("size"))
      .groupBy($"size").agg(count(lit(1)).as("n_components"))
      .orderBy($"size")
  }

  // lazy: groupGraphCte is declared further down the object and plain-val
  // initialization order would read it as null here
  lazy val componentSizesSql: String =
    groupGraphCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, edges AS (SELECT a, b FROM gp UNION ALL SELECT b, a FROM gp),
        |reach(node, m) AS (
        |  SELECT gid, gid FROM g
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
        |lab AS (SELECT node, min(m) AS label FROM reach GROUP BY node),
        |sz AS (SELECT label, count(*)::BIGINT AS size FROM lab
        |       GROUP BY label)
        |SELECT size, count(*)::BIGINT AS n_components
        |FROM sz GROUP BY size ORDER BY size""".stripMargin

  /** Degree frame + per-node triangle membership over a checkpointed
    * (a, b) edge frame — the MPS degree-oriented machinery shared by
    * [[triangles]] and [[clusteringCoeff]]. Returns (deg(v, d),
    * triCnt(group_id, tri_cnt)); triCnt covers only nodes in ≥1 triangle.
    */
  /** Oriented out-degree frame (src, od) of the contracted graph — the
    * quantity whose square-sum is the wedge volume; the diagnostic read
    * before choosing the exact vs degree-capped close
    * (`PlanDump --wedge-stats`).
    */
  def orientedOutDegrees(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir).pin(true)
    val nodes = pairs.select($"a".as("v")).unionByName(pairs.select($"b".as("v")))
    val deg = nodes.groupBy($"v").agg(count(lit(1)).as("d"))
    pairs
      .join(deg.select($"v".as("a"), $"d".as("da")), "a")
      .join(deg.select($"v".as("b"), $"d".as("db")), "b")
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"a")
          .otherwise($"b").as("src"))
      .groupBy($"src").agg(count(lit(1)).as("od"))
  }

  /** Triangle tuples (v, u, w) of an undirected a<b edge list via the
    * degree-oriented MPS wedge close — the tri frame is pinned (three
    * member-explode consumers in the node close; three edge-explode
    * consumers in the truss support).
    */
  private def triTuples(pairs: DataFrame): (DataFrame, DataFrame) = {
    val s = pairs.sparkSession
    import s.implicits._
    val nodes = pairs.select($"a".as("v")).unionByName(pairs.select($"b".as("v")))
    val deg = nodes.groupBy($"v").agg(count(lit(1)).as("d"))
    // orient each edge low-(deg,id) → high-(deg,id), carrying the dst's
    // degree so wedge ordering and the closing join need no further lookup
    val oriented = pairs
      .join(deg.select($"v".as("a"), $"d".as("da")), "a")
      .join(deg.select($"v".as("b"), $"d".as("db")), "b")
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
          struct($"a".as("src"), $"b".as("dst"), $"db".as("dd")))
          .otherwise(struct($"b".as("src"), $"a".as("dst"), $"da".as("dd")))
          .as("e"))
      .select($"e.src", $"e.dst", $"e.dd")
      .pin(true) // consumed three times: both wedge sides + close
    val wedges = oriented.as("x")
      .join(oriented.as("y"), $"x.src" === $"y.src" &&
        ($"x.dd" < $"y.dd" || ($"x.dd" === $"y.dd" && $"x.dst" < $"y.dst")))
      .select($"x.src".as("v"), $"x.dst".as("u"), $"y.dst".as("w"))
    val tri = wedges
      .join(oriented.as("z"), $"u" === $"z.src" && $"w" === $"z.dst")
      .select($"v", $"u", $"w")
      .pin(true)
    (deg, tri)
  }

  private def degAndTriCounts(pairs: DataFrame): (DataFrame, DataFrame) = {
    val s = pairs.sparkSession
    import s.implicits._
    val (deg, tri) = triTuples(pairs)
    val triCnt = tri.select($"v".as("group_id"))
      .unionByName(tri.select($"u".as("group_id")))
      .unionByName(tri.select($"w".as("group_id")))
      .groupBy($"group_id").agg(count(lit(1)).as("tri_cnt"))
    (deg, triCnt)
  }

  def triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true) // degree agg + both orientation joins
    degAndTriCounts(pairs)._2.orderBy($"group_id")
  }

  /** Local clustering coefficient per node of the group-contracted
    * near-dup graph: cc = 2·T(v) / (d(v)·(d(v)−1)) in exact integer
    * permille — the template-family cohesion score (cc ≈ 1: the node's
    * neighborhood is one template clique even after contraction; cc ≈ 0:
    * a hub stitching unrelated families, usually an LSH-band artifact
    * worth auditing). Complements [[kcore]] (which finds dense REGIONS)
    * with a per-node density that needs no iteration.
    *
    * Scale: triangle membership via the same degree-oriented MPS wedge
    * close as [[triangles]] (wedge volume O(m^1.5) on the contracted
    * graph), one degree agg, one |nodes|-row left join — no new shuffle
    * shape beyond what triangles already pays.
    */
  def clusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true) // degree agg + both orientation joins
    ccExactOnEdges(pairs)
  }

  /** The exact close of [[clusteringCoeff]] parameterized by an edge
    * list (`a`,`b` undirected pairs, already pinned) — shared by the
    * corpus-derived gate query and ScalingBench's synthetic heavy-tail
    * decade measurement.
    */
  private[graft] def ccExactOnEdges(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val (deg, triCnt) = degAndTriCounts(pairs)
    deg.join(triCnt, $"v" === $"group_id", "left")
      .select($"v".as("group_id"), $"d".as("deg"),
        coalesce($"tri_cnt", lit(0L)).as("tri_cnt"))
      .withColumn("cc_pm",
        when($"deg" >= 2L,
          floor(lit(2000L) * $"tri_cnt" / ($"deg" * ($"deg" - 1L)))
            .cast("long"))
          .otherwise(0L))
      .orderBy($"group_id")
  }

  /** Degree-CAPPED variant of [[clusteringCoeff]] — the wedge-volume
    * mitigation for the 100×+ regime. The exact MPS close's cost is the
    * wedge volume Σ od(v)² over oriented out-degrees; it is the first
    * corpus-volume term to surface in the graph battery (×12.7 wall at
    * ×100, PLANS.md round 11) because a few high-out-degree sources
    * dominate the sum. Here each source emits wedges only among its
    * `cap` FIRST out-neighbors in the (dd, dst) wedge order — a
    * deterministic prefix, not a sample — bounding wedge volume by
    * cap·m while the closing join is unchanged.
    *
    * Exactness contract: every node whose oriented out-degree is ≤ cap
    * emits ALL its wedges, so any triangle whose minimum-degree vertex
    * is below the cap is counted exactly; triangles are only ever
    * UNDER-counted (cc_pm is a lower bound), and with cap ≥ max
    * out-degree the output is bit-identical to [[clusteringCoeff]]
    * (CappedWedgeSpec). The per-source neighbor rank is a window
    * PARTITIONED by src — never a global window.
    *
    * Not oracle-gated: the exact form remains the gate; this is the
    * measured scale path (ScalingBench `graph_clustering_capped`).
    */
  def clusteringCoeffCapped(s: SparkSession, dir: String,
      cap: Int): DataFrame = {
    val pairs = groupPairsOf(s, dir)
      .pin(true) // degree agg + both orientation joins
    ccCappedOnEdges(pairs, cap)
  }

  /** The capped close of [[clusteringCoeffCapped]] parameterized by an
    * edge list, for the same two callers as [[ccExactOnEdges]]. */
  private[graft] def ccCappedOnEdges(pairs: DataFrame,
      cap: Int): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val nodes = pairs.select($"a".as("v")).unionByName(pairs.select($"b".as("v")))
    val deg = nodes.groupBy($"v").agg(count(lit(1)).as("d"))
    val oriented = pairs
      .join(deg.select($"v".as("a"), $"d".as("da")), "a")
      .join(deg.select($"v".as("b"), $"d".as("db")), "b")
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
          struct($"a".as("src"), $"b".as("dst"), $"db".as("dd")))
          .otherwise(struct($"b".as("src"), $"a".as("dst"), $"da".as("dd")))
          .as("e"))
      .select($"e.src", $"e.dst", $"e.dd")
      .pin(true) // rank pass + wedge sides + close
    // deterministic per-source prefix in the wedge order (dd, dst)
    val ranked = oriented
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"dd", $"dst")))
      .filter($"rn" <= cap)
      .drop("rn")
      .pin(true) // both wedge sides
    val wedges = ranked.as("x")
      .join(ranked.as("y"), $"x.src" === $"y.src" &&
        ($"x.dd" < $"y.dd" || ($"x.dd" === $"y.dd" && $"x.dst" < $"y.dst")))
      .select($"x.src".as("v"), $"x.dst".as("u"), $"y.dst".as("w"))
    val tri = wedges
      .join(oriented.as("z"), $"u" === $"z.src" && $"w" === $"z.dst")
      .select($"v", $"u", $"w")
      .pin(true)
    val triCnt = tri.select($"v".as("group_id"))
      .unionByName(tri.select($"u".as("group_id")))
      .unionByName(tri.select($"w".as("group_id")))
      .groupBy($"group_id").agg(count(lit(1)).as("tri_cnt"))
    deg.join(triCnt, $"v" === $"group_id", "left")
      .select($"v".as("group_id"), $"d".as("deg"),
        coalesce($"tri_cnt", lit(0L)).as("tri_cnt"))
      .withColumn("cc_pm",
        when($"deg" >= 2L,
          floor(lit(2000L) * $"tri_cnt" / ($"deg" * ($"deg" - 1L)))
            .cast("long"))
          .otherwise(0L))
      .orderBy($"group_id")
  }

  /** Degree HISTOGRAM of the near-dup candidate graph in log2 buckets
    * (bucket = bitlength(degree), isolated docs in bucket 0): the
    * graph-shape diagnostic a pipeline reads BEFORE running contraction /
    * PageRank at scale — a heavy tail here predicts skewed shuffles and
    * says whether the salting/AQE-skew machinery will be needed.
    * Bit-length bucketing keeps the histogram integer-exact (no float
    * log); counting every document (left join) makes the histogram
    * conserve the corpus.
    */
  def degreeHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = minhashCandidates(s, dir)
    val ends = pairs.select($"a".as("v"))
      .unionByName(pairs.select($"b".as("v")))
    val deg = Tables.documents(s, dir).select($"doc_id".as("v"))
      .join(ends.groupBy($"v").agg(count(lit(1)).as("d")), Seq("v"), "left")
      .select($"v", coalesce($"d", lit(0L)).as("d"))
    deg.withColumn("bucket",
        when($"d" === 0, 0L).otherwise(length(bin($"d")).cast("long")))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_nodes"), min($"d").as("min_deg"),
        max($"d").as("max_deg"))
      .orderBy($"bucket")
  }

  val degreeHistSql: String = minhashPairsCte +
    """,
      |nd AS (SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs),
      |dg AS (SELECT v, count(*)::BIGINT AS d FROM nd GROUP BY v),
      |alldeg AS (
      |  SELECT doc.doc_id AS v, coalesce(dg.d, 0)::BIGINT AS deg
      |  FROM documents doc LEFT JOIN dg ON doc.doc_id = dg.v)
      |SELECT (CASE WHEN deg = 0 THEN 0
      |             ELSE length(bin(deg)) END)::BIGINT AS bucket,
      |  count(*)::BIGINT AS n_nodes, min(deg)::BIGINT AS min_deg,
      |  max(deg)::BIGINT AS max_deg
      |FROM alldeg GROUP BY 1 ORDER BY bucket""".stripMargin

  /** CTE prefix ending in `gp(a, b)` — the group-contracted graph, shared
    * by the triangles and common-neighbors oracles.
    */
  private val groupGraphCte: String = tokCte + {
    val cols = A.indices.map(j =>
      s"min((${A(j)} * code + ${B(j)}) % 2147483647) AS mh$j").mkString(", ")
    def sig(i: Int) =
      (1 until 4).foldLeft(s"mh${i}")((acc, j) =>
        s"(($acc) % $M * 131071 + mh${i + j}) % $M")
    s""", sigs AS (SELECT doc_id, $cols FROM codes GROUP BY doc_id),
       |bsig AS (SELECT doc_id, ${sig(0)} AS s0, ${sig(4)} AS s1 FROM sigs),
       |g AS (SELECT s0, s1, min(doc_id) AS gid FROM bsig GROUP BY s0, s1),
       |gp AS (
       |  SELECT DISTINCT l.gid AS a, r.gid AS b
       |  FROM g l JOIN g r ON (l.s0 = r.s0 OR l.s1 = r.s1)
       |    AND l.gid < r.gid)
       |""".stripMargin
  }

  /** k-TRUSS of the contracted near-dup graph (Cohen 2008; the Graph
    * Challenge kernel), k = 4: the maximal subgraph in which every
    * surviving edge sits in ≥ k−2 = 2 triangles OF THE SUBGRAPH — the
    * edge-level density filter one notch stricter than triangle counting
    * (an edge in 2 triangles of the full graph can still die when its
    * supporting edges are peeled). Where [[kcore]] keeps dense NODES and
    * [[triangles]] scores them, the truss keeps certified-dense EDGES —
    * the subgraph a cluster-keeper can act on without the bridge-edge
    * false merges plain CC inherits.
    *
    * Shape: iterative peel — each round one degree-oriented MPS wedge
    * close ([[triTuples]], wedge volume O(m^1.5)) restricted to the
    * surviving edges, one 3-way edge explode + keyed count, one filter.
    * ROUNDS ARE PINNED at 5 in BOTH engines (peeling is idempotent at
    * the fixpoint, so extra rounds are no-ops) and the Spark side
    * REQUIRES convergence by round 5 — the same fixed-round doctrine as
    * the MST/PCA oracles, without a data-dependent round count leaking
    * into the oracle string.
    */
  def truss(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    import s.implicits._
    def support(edges: DataFrame): DataFrame = {
      val (_, tri) = triTuples(edges)
      val mem = tri.select(least($"v", $"u").as("a"),
          greatest($"v", $"u").as("b"))
        .unionByName(tri.select(least($"v", $"w").as("a"),
          greatest($"v", $"w").as("b")))
        .unionByName(tri.select(least($"u", $"w").as("a"),
          greatest($"u", $"w").as("b")))
      mem.groupBy($"a", $"b").agg(count(lit(1)).as("support"))
    }
    var edges = groupPairsOf(s, dir).pin(true)
    var lastCount = -1L
    for (_ <- 1 to 5) {
      lastCount = edges.count()
      edges = support(edges).filter($"support" >= k - 2L)
        .select($"a", $"b").pin(true)
    }
    require(edges.count() == lastCount,
      "truss peeling did not converge within the 5 pinned rounds")
    support(edges).filter($"support" >= k - 2L)
      .orderBy($"a", $"b")
  }

  val trussSql: String = groupGraphCte + {
    val rounds = (1 to 6).map { r =>
      s""",
         |tr$r AS MATERIALIZED (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e${r - 1} e1
         |  JOIN e${r - 1} e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e${r - 1} e3 ON e3.a = e1.b AND e3.b = e2.b),
         |sup$r AS MATERIALIZED (
         |  SELECT a, b, count(*)::BIGINT AS support FROM (
         |    SELECT x AS a, y AS b FROM tr$r
         |    UNION ALL SELECT x, z FROM tr$r
         |    UNION ALL SELECT y, z FROM tr$r) m GROUP BY 1, 2),
         |e$r AS MATERIALIZED (
         |  SELECT s.a, s.b FROM sup$r s WHERE s.support >= 2)""".stripMargin
    }.mkString
    s""", e0 AS MATERIALIZED (SELECT a, b FROM gp)$rounds
       |SELECT a, b, support FROM sup6
       |WHERE support >= 2 ORDER BY a, b""".stripMargin
  }

  val trianglesSql: String = groupGraphCte + {
    s""", nd AS (SELECT a AS v FROM gp UNION ALL SELECT b FROM gp),
       |dg AS (SELECT v, count(*)::BIGINT AS d FROM nd GROUP BY v),
       |o AS (SELECT
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
       |         THEN p.a ELSE p.b END AS src,
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
       |         THEN p.b ELSE p.a END AS dst
       |  FROM gp p JOIN dg da ON p.a = da.v JOIN dg db ON p.b = db.v),
       |od AS (SELECT o.src, o.dst, dg.d AS dd FROM o JOIN dg ON o.dst = dg.v),
       |tri AS (
       |  SELECT x.src AS v, x.dst AS u, y.dst AS ww
       |  FROM od x JOIN od y ON x.src = y.src
       |    AND (x.dd < y.dd OR (x.dd = y.dd AND x.dst < y.dst))
       |  WHERE EXISTS (SELECT 1 FROM od z
       |                WHERE z.src = x.dst AND z.dst = y.dst)),
       |mem AS (SELECT v AS gid FROM tri
       |        UNION ALL SELECT u FROM tri
       |        UNION ALL SELECT ww FROM tri)
       |SELECT gid AS group_id, count(*)::BIGINT AS tri_cnt
       |FROM mem GROUP BY gid ORDER BY group_id""".stripMargin
  }

  val clusteringCoeffSql: String = groupGraphCte + {
    s""", nd AS (SELECT a AS v FROM gp UNION ALL SELECT b FROM gp),
       |dg AS (SELECT v, count(*)::BIGINT AS d FROM nd GROUP BY v),
       |o AS (SELECT
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
       |         THEN p.a ELSE p.b END AS src,
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
       |         THEN p.b ELSE p.a END AS dst
       |  FROM gp p JOIN dg da ON p.a = da.v JOIN dg db ON p.b = db.v),
       |od AS (SELECT o.src, o.dst, dg.d AS dd FROM o JOIN dg ON o.dst = dg.v),
       |tri AS (
       |  SELECT x.src AS v, x.dst AS u, y.dst AS ww
       |  FROM od x JOIN od y ON x.src = y.src
       |    AND (x.dd < y.dd OR (x.dd = y.dd AND x.dst < y.dst))
       |  WHERE EXISTS (SELECT 1 FROM od z
       |                WHERE z.src = x.dst AND z.dst = y.dst)),
       |mem AS (SELECT v AS gid FROM tri
       |        UNION ALL SELECT u FROM tri
       |        UNION ALL SELECT ww FROM tri),
       |tc AS (SELECT gid, count(*)::BIGINT AS tri_cnt FROM mem GROUP BY gid)
       |SELECT dg.v AS group_id, dg.d AS deg,
       |  coalesce(tc.tri_cnt, 0)::BIGINT AS tri_cnt,
       |  (CASE WHEN dg.d >= 2
       |        THEN (2000 * coalesce(tc.tri_cnt, 0)) // (dg.d * (dg.d - 1))
       |        ELSE 0 END)::BIGINT AS cc_pm
       |FROM dg LEFT JOIN tc ON dg.v = tc.gid ORDER BY group_id""".stripMargin
  }

  /** Link prediction over the group-contracted near-dup graph: the top-20
    * NON-adjacent group pairs by common-neighbor count — the classic
    * triadic-closure predictor ("these two template families share many
    * near-dup neighbors but never collided in a band; check them") that a
    * dedup pipeline uses to audit LSH recall: a high-common-neighbor
    * non-edge is exactly where banding most likely missed a true pair.
    *
    * Scale: wedges enumerate each center's neighbor pairs (Σ C(d,2) —
    * bounded on the CONTRACTED graph, whose max degree scales with
    * content diversity, not duplication volume; [[degreeHist]] is the
    * pre-flight check), count per candidate pair with one mergeable agg,
    * anti-join the existing edges out, then TakeOrdered for the top-20.
    * No all-pairs step anywhere.
    */
  def commonNeighbors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = groupPairsOf(s, dir)
      .pin(true) // symmetrization + the non-edge anti-join
    val sym = pairs.select($"a".as("c"), $"b".as("x"))
      .unionByName(pairs.select($"b".as("c"), $"a".as("x")))
      .pin(true) // both wedge sides
    val cand = sym.as("l")
      .join(sym.as("r"), $"l.c" === $"r.c" && $"l.x" < $"r.x")
      .select($"l.x".as("a"), $"r.x".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("common"))
    val top = cand.join(pairs, Seq("a", "b"), "left_anti")
      .orderBy($"common".desc, $"a", $"b").limit(20)
    top.withColumn("rnk", row_number().over(
        Window.orderBy($"common".desc, $"a", $"b"))) // 20-row frame
      .orderBy($"rnk")
  }

  val commonNeighborsSql: String = groupGraphCte +
    """, sym AS (SELECT a AS c, b AS x FROM gp
      |         UNION ALL SELECT b, a FROM gp),
      |cand AS (
      |  SELECT l.x AS a, r.x AS b, count(*)::BIGINT AS common
      |  FROM sym l JOIN sym r ON l.c = r.c AND l.x < r.x
      |  GROUP BY 1, 2),
      |ne AS (SELECT c.a, c.b, c.common FROM cand c
      |       LEFT JOIN gp ON gp.a = c.a AND gp.b = c.b
      |       WHERE gp.a IS NULL),
      |top AS (SELECT * FROM ne ORDER BY common DESC, a, b LIMIT 20)
      |SELECT a, b, common,
      |  row_number() OVER (ORDER BY common DESC, a, b) AS rnk
      |FROM top ORDER BY rnk""".stripMargin

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): per doc, 4-token-gram rolling
    * hashes, then the w = 4 window-min selection — every window of 4
    * consecutive grams contributes its minimum hash, which guarantees
    * any shared run of ≥ w + k − 1 = 7 tokens between two docs shares at
    * least one selected fingerprint (the paper's detection guarantee,
    * which uniform sampling of grams cannot give). Fingerprints are the
    * DISTINCT (doc, hash) selections; the match surface is the top-20
    * doc pairs by shared-fingerprint count — the plagiarism/boilerplate
    * readout MOSS serves, here over the corpus.
    *
    * Scale: one positional window pass builds grams and window-mins
    * (per-doc windows, never corpus-wide); fingerprints with df > 10 are
    * dropped before the pair join (the MOSS "too common to mean
    * anything" prune — the same posting-head discipline as AllPairs'
    * df-ascending prefixes), so pair volume is Σ df² over the pruned
    * postings, never all-pairs.
    */
  def winnowingMatches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val P = 2147483647L
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .select($"doc_id", $"pos", tokenCode($"w").as("c"))
    val grams = toks
      .withColumn("c1", lead($"c", 1).over(dw))
      .withColumn("c2", lead($"c", 2).over(dw))
      .withColumn("c3", lead($"c", 3).over(dw))
      .filter($"c3".isNotNull)
      .select($"doc_id", $"pos",
        ((($"c" % P * 131071L + $"c1") % P * 131071L + $"c2") % P
          * 131071L + $"c3" % P).mod(P).as("h"))
    val wmin = grams
      .withColumn("m", min($"h").over(dw.rowsBetween(0, 3)))
      .withColumn("full", lead($"h", 3).over(dw))
      .filter($"full".isNotNull) // complete windows only
      .select($"doc_id", $"m".as("fp")).distinct()
      .pin(true) // df prune + both sides of the match join
    val keep = wmin.groupBy($"fp").agg(count(lit(1)).as("df"))
      .filter($"df" <= 10L && $"df" >= 2L).select($"fp")
    val pruned = wmin.join(keep, Seq("fp"))
    val matches = pruned.select($"fp", $"doc_id".as("a"))
      .join(pruned.select($"fp", $"doc_id".as("b")), Seq("fp"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_shared"))
    val top = matches.orderBy($"n_shared".desc, $"a", $"b").limit(20)
    top.withColumn("rnk", row_number().over(
        Window.orderBy($"n_shared".desc, $"a", $"b"))) // 20-row frame
      .orderBy($"rnk")
  }

  val winnowingMatchesSql: String =
    s"""WITH toksp AS (
       |  SELECT doc_id,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos,
       |    unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |cps AS (SELECT doc_id, pos, $tokenCodeSql AS c FROM toksp),
       |ld AS (
       |  SELECT doc_id, pos, c, lead(c, 1) OVER dw AS c1,
       |         lead(c, 2) OVER dw AS c2, lead(c, 3) OVER dw AS c3
       |  FROM cps WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |grams AS (
       |  SELECT doc_id, pos,
       |    (((c % 2147483647 * 131071 + c1) % 2147483647 * 131071 + c2)
       |      % 2147483647 * 131071 + c3 % 2147483647) % 2147483647 AS h
       |  FROM ld WHERE c3 IS NOT NULL),
       |wm AS (
       |  SELECT doc_id,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
       |    lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS fl
       |  FROM grams),
       |fps AS (SELECT DISTINCT doc_id, m AS fp FROM wm
       |        WHERE fl IS NOT NULL),
       |keep AS (SELECT fp FROM fps GROUP BY fp
       |         HAVING count(*) <= 10 AND count(*) >= 2),
       |pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp)),
       |matches AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS n_shared
       |  FROM pruned l JOIN pruned r
       |    ON l.fp = r.fp AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |top AS (SELECT * FROM matches
       |        ORDER BY n_shared DESC, a, b LIMIT 20)
       |SELECT a, b, n_shared,
       |  row_number() OVER (ORDER BY n_shared DESC, a, b) AS rnk
       |FROM top ORDER BY rnk""".stripMargin

  /** Resource-Allocation link-prediction index (Zhou, Lü & Zhang, Eur.
    * Phys. J. B 2009) over the contracted near-dup graph: for each
    * NON-adjacent group pair, Σ over common neighbors z of 1/deg(z) —
    * [[commonNeighbors]] re-weighted so a promiscuous hub certifies
    * nothing while a low-degree bridge certifies a lot (RA beats
    * Adamic–Adar's 1/log deg on most link-prediction benchmarks, and its
    * reciprocal is integer-exact where 1/log is not: each term is
    * floor(10⁹/deg z), so the cross-engine sum needs no float fold). The
    * pipeline reading: "which duplicate families are ABOUT to merge" —
    * the pairs a slightly looser banding would connect next.
    *
    * Scale: the same one-wedge-join shape as [[commonNeighbors]] /
    * triangles (volume Σ deg z², the measured family); the per-z term
    * rides the wedge join's left leg, so scoring adds no extra pass.
    */
  def resourceAlloc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = groupPairsOf(s, dir)
      .pin(true) // symmetrization + the non-edge anti-join
    val sym = pairs.select($"a".as("c"), $"b".as("x"))
      .unionByName(pairs.select($"b".as("c"), $"a".as("x")))
      .pin(true) // degree agg + both wedge sides
    val deg = sym.groupBy($"c").agg(count(lit(1)).as("d"))
    val wz = sym.join(deg, Seq("c"))
      .withColumn("t", expr("1000000000 div d"))
      .select($"c", $"x", $"t")
    val cand = wz.as("l")
      .join(wz.as("r"), $"l.c" === $"r.c" && $"l.x" < $"r.x")
      .select($"l.x".as("a"), $"r.x".as("b"), $"l.t".as("t"))
      .groupBy($"a", $"b").agg(sum($"t").as("ra"))
    val top = cand.join(pairs, Seq("a", "b"), "left_anti")
      .orderBy($"ra".desc, $"a", $"b").limit(20)
    top.withColumn("rnk", row_number().over(
        Window.orderBy($"ra".desc, $"a", $"b"))) // 20-row frame
      .orderBy($"rnk")
  }

  val resourceAllocSql: String = groupGraphCte +
    """, sym AS (SELECT a AS c, b AS x FROM gp
      |         UNION ALL SELECT b, a FROM gp),
      |dg AS (SELECT c, count(*)::BIGINT AS d FROM sym GROUP BY c),
      |wz AS (SELECT s.c, s.x, (1000000000 // d.d)::BIGINT AS t
      |       FROM sym s JOIN dg d ON s.c = d.c),
      |cand AS (
      |  SELECT l.x AS a, r.x AS b, sum(l.t)::BIGINT AS ra
      |  FROM wz l JOIN wz r ON l.c = r.c AND l.x < r.x
      |  GROUP BY 1, 2),
      |ne AS (SELECT c.a, c.b, c.ra FROM cand c
      |       LEFT JOIN gp ON gp.a = c.a AND gp.b = c.b
      |       WHERE gp.a IS NULL),
      |top AS (SELECT * FROM ne ORDER BY ra DESC, a, b LIMIT 20)
      |SELECT a, b, ra,
      |  row_number() OVER (ORDER BY ra DESC, a, b) AS rnk
      |FROM top ORDER BY rnk""".stripMargin

  /** Label-propagation communities (Raghavan et al. 2007, synchronous
    * variant, 3 fixed rounds) over the group-contracted near-dup graph,
    * scored by Newman modularity (Newman & Girvan 2004) in EXACT
    * integers — the community-structure readout between
    * [[componentSizes]]' too-coarse components and [[triangles]]' too-
    * local clique signal: which template FAMILIES exist inside the giant
    * component, and is the partition better than chance? Each node
    * adopts the plurality label of its neighbors (ties → smallest
    * label, so the fixed-point is deterministic without per-node
    * randomness); after 3 rounds each community c reports its size,
    * internal edge count e_c, degree mass d_c, and the modularity cell
    * 4m·e_c − d_c² — Q·4m² = Σ_c cells, so the float-free cells ARE the
    * score (headroom: d_c < 3·10⁹ keeps d_c² in int64).
    *
    * Scale: per round ONE edge⋈label join + a (node,label)-keyed count +
    * a per-node struct-max argmax — all mergeable keyed aggs, linear in
    * |E| per round, never per-source or all-pairs; the label frame is
    * checkpointed so 3-round lineage stays flat. Modularity is two keyed
    * aggs over the final labels plus an m-sized literal.
    */
  def lpaModularity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true) // symmetrization, e_in count, and m
    val m = pairs.count()
    val sym = pairs.select($"a".as("v"), $"b".as("u"))
      .unionByName(pairs.select($"b".as("v"), $"a".as("u")))
      .pin(true) // re-joined every round
    val deg = sym.groupBy($"v").agg(count(lit(1)).as("d"))
      .pin(true) // initial labels + the degree-mass agg
    var lbl = deg.select($"v", $"v".as("lbl"))
    for (_ <- 1 to 3) {
      lbl = sym
        .join(lbl.select($"v".as("u"), $"lbl"), "u")
        .groupBy($"v", $"lbl").agg(count(lit(1)).as("cnt"))
        .groupBy($"v")
        .agg(max(struct($"cnt", (-$"lbl").as("neg"))).as("w"))
        .select($"v", (-$"w.neg").as("lbl"))
        .pin(true) // flatten the per-round lineage
    }
    val dsum = lbl.join(deg, "v")
      .groupBy($"lbl")
      .agg(count(lit(1)).as("size"), sum($"d").as("d_sum"))
    val ein = pairs
      .join(lbl.select($"v".as("a"), $"lbl".as("la")), "a")
      .join(lbl.select($"v".as("b"), $"lbl".as("lb")), "b")
      .filter($"la" === $"lb")
      .groupBy($"la".as("lbl")).agg(count(lit(1)).as("e_in"))
    dsum.join(ein, Seq("lbl"), "left")
      .select($"lbl".as("label"), $"size", $"d_sum",
        coalesce($"e_in", lit(0L)).as("e_in"),
        (lit(4L * m) * coalesce($"e_in", lit(0L)) - $"d_sum" * $"d_sum")
          .as("q_cell"))
      .orderBy($"label")
  }

  /** One synchronous LPA round as SQL: plurality neighbor label with
    * smallest-label tie-break, argmax encoded scalar (cnt·2⁴⁰ − (lbl+1):
    * max score ⇔ max cnt then min lbl; decoded exactly) — semantics, not
    * implementation, mirrored from the Spark struct-max.
    */
  val lpaModularitySql: String = {
    val S = 1099511627776L // 2^40 > any gid+1 at gate scale
    def round(k: Int): String =
      s""",
         |v$k AS (SELECT s.v, l.lbl, count(*)::BIGINT AS cnt
         |        FROM sym s JOIN l${k - 1} l ON s.u = l.v
         |        GROUP BY s.v, l.lbl),
         |l$k AS (SELECT v,
         |    ((max(cnt * $S - (lbl + 1)) // $S + 1) * $S
         |     - max(cnt * $S - (lbl + 1)) - 1)::BIGINT AS lbl
         |  FROM v$k GROUP BY v)""".stripMargin
    groupGraphCte +
      """, nd AS (SELECT a AS v FROM gp UNION ALL SELECT b FROM gp),
        |dg AS (SELECT v, count(*)::BIGINT AS d FROM nd GROUP BY v),
        |sym AS (SELECT a AS v, b AS u FROM gp
        |        UNION ALL SELECT b, a FROM gp),
        |mm AS (SELECT count(*)::BIGINT AS m FROM gp),
        |l0 AS (SELECT v, v AS lbl FROM dg)""".stripMargin +
      (1 to 3).map(round).mkString +
      """,
        |dsum AS (SELECT l.lbl, count(*)::BIGINT AS size,
        |           sum(dg.d)::BIGINT AS d_sum
        |         FROM l3 l JOIN dg ON l.v = dg.v GROUP BY l.lbl),
        |ein AS (SELECT la.lbl, count(*)::BIGINT AS e_in
        |        FROM gp JOIN l3 la ON gp.a = la.v
        |                JOIN l3 lb ON gp.b = lb.v
        |        WHERE la.lbl = lb.lbl GROUP BY la.lbl)
        |SELECT d.lbl AS label, d.size, d.d_sum,
        |  coalesce(e.e_in, 0)::BIGINT AS e_in,
        |  (4 * mm.m * coalesce(e.e_in, 0) - d.d_sum * d.d_sum)::BIGINT
        |    AS q_cell
        |FROM dsum d LEFT JOIN ein e ON d.lbl = e.lbl CROSS JOIN mm
        |ORDER BY label""".stripMargin
  }

  /** Minimum spanning forest of the contracted near-dup graph under
    * exact Jaccard DISTANCE (Borůvka 1926 — the parallel MST algorithm;
    * distributed form as in Karloff–Suri–Vassilvitskii MRC) — the
    * single-linkage hierarchy backbone (HDBSCAN's first stage): the MSF
    * orders near-dup families by merge distance, so cutting it at any
    * threshold yields exactly the single-linkage clustering at that
    * radius without re-running anything. Edge weight = 1000 − exact
    * distinct-token Jaccard permille between the groups' representative
    * docs, totally ordered by (w, a, b) so the forest is UNIQUE and
    * both engines converge to the same edge set.
    *
    * Scale: Borůvka is the MST algorithm that parallelizes — per round
    * every component picks its lightest outgoing edge (one keyed
    * struct-min agg), selected edges contract via [[starContraction]]
    * (O(log n) keyed rounds), and the component count at least HALVES
    * per round, so rounds ≤ log₂(largest component). Every step is a
    * keyed join/agg over the edge frame — no sequential union-find, no
    * driver-side edges. The oracle mirrors the rounds exactly (7 ≥
    * ⌈log₂ 77⌉, the gate's largest component), each contraction a
    * recursive reachability CTE.
    */
  def mstForest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = jaccardEdges(s, dir).pin(true)
    // ACTIVE frame (r16): the edge frame carries its endpoints' CURRENT
    // component labels inline (ca, cb) and is re-labeled in place each
    // round — the r15 form kept a separate |V|-row (v → c) vertex map,
    // re-tagged the FULL edge frame against it every round (2 joins over
    // a non-shrinking input), and paid one more pinned job per round to
    // maintain the map. The active frame only ever SHRINKS (cross-edges
    // that become internal are filtered out for good), relabeling joins
    // the ≤#components-row label frame, and the vertex map is gone —
    // one fewer pinned action per round and monotonically less shuffle
    // volume, which is what round-latency-bound Borůvka actually pays.
    var act = edges.select($"a", $"b", $"w", $"a".as("ca"), $"b".as("cb"))
      .pin(true)
    val sel = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // round cap = ⌈log₂ |V|⌉ (VERDICT r14 #2): Borůvka at least halves
    // every component per round, so ⌈log₂(largest component)⌉ ≤
    // ⌈log₂ |V|⌉ rounds always suffice — the generic 32 was a fuse sized
    // for no particular input, and each surplus probe round costs a full
    // tag+min-agg action after convergence. (Gate: |V| = 1291 → cap 11;
    // the data-driven mr.isEmpty termination usually fires far earlier —
    // the cap only bounds the adversarial worst case at ANY scale, where
    // a fixed 7 would silently truncate the forest on a bigger corpus.)
    val nVertices = edges.select($"a".as("v"))
      .unionByName(edges.select($"b".as("v"))).distinct().count()
    val cap = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, nVertices - 1)))
    var done = false
    var rounds = 0
    while (!done && rounds < cap) {
      val e = struct($"w", $"a", $"b", $"ca", $"cb").as("e")
      val mr = act.select($"ca".as("cc"), e)
        .unionByName(act.select($"cb".as("cc"), e))
        .groupBy($"cc").agg(min($"e").as("e"))
        .select($"e.w", $"e.a", $"e.b", $"e.ca", $"e.cb")
        .distinct() // the two endpoints of a mutual-min edge pick it twice
        .pin(true)
      // termination fused into the min-edge agg (VERDICT r13 #8): mr is
      // empty iff act is (every component with a cross edge picks one),
      // and mr is pinned anyway
      if (mr.isEmpty) done = true
      else {
        sel += mr.select($"a", $"b", $"w")
        // contraction = components of the selected-edge graph, via the
        // shared starContraction (O(log) keyed rounds). A pointer-
        // doubling contraction (the textbook Borůvka step) was tried
        // and reverted: with pins per doubling it pays MORE fixed job
        // latency than starContraction, and without them the self-join
        // chain doubles the plan per step and froze the optimizer —
        // gate wall here is round-latency-bound, not volume-bound, and
        // starContraction is the proven form.
        // Every ACTIVE component is an endpoint of some selected edge
        // (it picked one), so the selected-edge node set covers every
        // label the relabel below can meet — no separate vertex frame.
        val (labels, _) = starContraction(
          mr.select($"ca".as("c")).unionByName(mr.select($"cb".as("c")))
            .distinct(),
          mr.select($"ca".as("a"), $"cb".as("b")))
        // broadcast: the label frame is ≤#components rows (halving each
        // round) but reaches Catalyst as an unestimated join lineage —
        // without the hint it can fall to a sort-merge join that
        // shuffles the whole active frame twice per round
        val lab = labels.select($"c", $"label")
        act = act
          .join(broadcast(lab.select($"c".as("ca"), $"label".as("la"))),
            Seq("ca"))
          .join(broadcast(lab.select($"c".as("cb"), $"label".as("lb"))),
            Seq("cb"))
          .filter($"la" =!= $"lb")
          .select($"a", $"b", $"w", $"la".as("ca"), $"lb".as("cb"))
          .pin(true)
        rounds += 1
      }
    }
    if (sel.isEmpty) edges.select($"a", $"b", $"w").limit(0)
    else sel.reduce(_.unionByName(_)).orderBy($"a", $"b")
  }

  /** Borůvka mirrored round-by-round in SQL: per round the component-
    * tagged active edges, a row_number()=1 lightest-outgoing pick per
    * component (the struct-min), and a recursive-reachability
    * contraction of the selected edges; 7 rounds ≥ ⌈log₂(largest gate
    * component)⌉, later rounds no-op once converged.
    */
  lazy val mstForestSql: String = {
    // every multiply-referenced CTE is AS MATERIALIZED: DuckDB inlines
    // plain CTEs per reference, and with each round reading the previous
    // round's labels twice the 7-round chain would inline the whole
    // band-join pipeline 2^7 times (measured: file-handle exhaustion)
    def round(r: Int): String =
      s""",
         |t$r AS MATERIALIZED (
         |        SELECT e.a, e.b, e.w, x.c AS ca, y.c AS cb
         |        FROM ew e JOIN c${r - 1} x ON e.a = x.v
         |                  JOIN c${r - 1} y ON e.b = y.v
         |        WHERE x.c <> y.c),
         |s$r AS (SELECT w, a, b, ca, cb FROM (
         |          SELECT cc, w, a, b, ca, cb,
         |            row_number() OVER (PARTITION BY cc ORDER BY w, a, b)
         |              AS rn
         |          FROM (SELECT ca AS cc, w, a, b, ca, cb FROM t$r
         |                UNION ALL SELECT cb, w, a, b, ca, cb FROM t$r))
         |        WHERE rn = 1),
         |m$r AS MATERIALIZED (SELECT DISTINCT w, a, b, ca, cb FROM s$r),
         |y$r AS MATERIALIZED (SELECT ca AS x, cb AS y FROM m$r
         |        UNION ALL SELECT cb, ca FROM m$r),
         |r$r(n, m) AS (SELECT x, x FROM y$r
         |        UNION SELECT y$r.x, r$r.m FROM y$r JOIN r$r ON y$r.y = r$r.n),
         |l$r AS MATERIALIZED (SELECT n, min(m) AS lbl FROM r$r GROUP BY n),
         |c$r AS MATERIALIZED (
         |        SELECT p.v, coalesce(l$r.lbl, p.c) AS c
         |        FROM c${r - 1} p LEFT JOIN l$r ON p.c = l$r.n)""".stripMargin
    groupGraphCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |it AS (SELECT p.a, p.b, count(*) AS c
        |       FROM gp p JOIN tok x ON x.doc_id = p.a
        |                 JOIN tok y ON y.doc_id = p.b AND y.w = x.w
        |       GROUP BY 1, 2),
        |ew AS MATERIALIZED (
        |       SELECT p.a, p.b,
        |         (1000 - (1000 * coalesce(it.c, 0))
        |          // (sa.n + sb.n - coalesce(it.c, 0)))::BIGINT AS w
        |       FROM gp p LEFT JOIN it ON p.a = it.a AND p.b = it.b
        |       JOIN sz sa ON sa.doc_id = p.a
        |       JOIN sz sb ON sb.doc_id = p.b),
        |vn AS (SELECT DISTINCT v FROM
        |        (SELECT a AS v FROM ew UNION ALL SELECT b FROM ew)),
        |c0 AS MATERIALIZED (SELECT v, v AS c FROM vn)""".stripMargin +
      (1 to 7).map(round).mkString +
      """
        |SELECT a, b, w FROM (
        |  SELECT w, a, b FROM m1 UNION ALL SELECT w, a, b FROM m2
        |  UNION ALL SELECT w, a, b FROM m3 UNION ALL SELECT w, a, b FROM m4
        |  UNION ALL SELECT w, a, b FROM m5 UNION ALL SELECT w, a, b FROM m6
        |  UNION ALL SELECT w, a, b FROM m7)
        |ORDER BY a, b""".stripMargin
  }

  /** Shared weighted edge frame of the contracted near-dup graph —
    * (a, b, w) with w = 1000 − exact distinct-token Jaccard permille of
    * the group representatives; the input of [[mstForest]] and
    * [[singleLinkage]].
    */
  private def jaccardEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir).pin(true)
    val tok = tokens(s, dir).pin(true) // intersection join + size agg
    val sz = tok.groupBy($"doc_id").agg(count(lit(1)).as("n")).pin(true)
    val it = pairs
      .join(tok.select($"doc_id".as("a"), $"w"), "a")
      .join(tok.select($"doc_id".as("b"), $"w"), Seq("b", "w"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    pairs
      .join(it, Seq("a", "b"), "left")
      .join(sz.select($"doc_id".as("a"), $"n".as("na")), "a")
      .join(sz.select($"doc_id".as("b"), $"n".as("nb")), "b")
      .select($"a", $"b",
        (lit(1000L) - expr(
          "(1000 * coalesce(c, 0)) div (na + nb - coalesce(c, 0))")).as("w"))
  }

  /** Single-linkage clusters at radius τ=100 (Jaccard ≥ 0.9): the
    * dendrogram CUT the MSF encodes — connected components of the
    * τ-thresholded weighted graph, which equal the components of the
    * MSF's ≤τ edges (the single-linkage/MST duality; SingleLinkageSpec
    * asserts the equivalence against [[mstForest]] directly). Output is
    * the cluster-size histogram plus the within-radius edge count — the
    * "how much does the corpus clump at this similarity?" readout a
    * dedup policy sweeps before picking its merge radius.
    *
    * Scale: the threshold filter prunes BEFORE contraction, so the CC
    * runs on the sparse ≤τ subgraph ([[starContraction]], O(log n)
    * keyed rounds); the histogram is two bounded aggs. Cheaper than
    * cutting a materialized MSF — same answer by the duality.
    */
  def singleLinkage(s: SparkSession, dir: String, tau: Long = 100L)
      : DataFrame = {
    import s.implicits._
    val edges = jaccardEdges(s, dir).filter($"w" <= tau).pin(true)
    val nodes = groupFrame(s, dir).select($"gid")
    val (labels, _) = starContraction(nodes, edges.select($"a", $"b"))
    labels.groupBy($"label").agg(count(lit(1)).as("size"))
      .groupBy($"size").agg(count(lit(1)).as("n_clusters"))
      .orderBy($"size")
  }

  lazy val singleLinkageSql: String =
    groupGraphCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |it AS (SELECT p.a, p.b, count(*) AS c
        |       FROM gp p JOIN tok x ON x.doc_id = p.a
        |                 JOIN tok y ON y.doc_id = p.b AND y.w = x.w
        |       GROUP BY 1, 2),
        |ew AS MATERIALIZED (
        |       SELECT p.a, p.b,
        |         (1000 - (1000 * coalesce(it.c, 0))
        |          // (sa.n + sb.n - coalesce(it.c, 0)))::BIGINT AS w
        |       FROM gp p LEFT JOIN it ON p.a = it.a AND p.b = it.b
        |       JOIN sz sa ON sa.doc_id = p.a
        |       JOIN sz sb ON sb.doc_id = p.b),
        |kept AS (SELECT a, b FROM ew WHERE w <= 100),
        |sym AS (SELECT a, b FROM kept UNION ALL SELECT b, a FROM kept),
        |reach(node, m) AS (
        |  SELECT gid, gid FROM g
        |  UNION
        |  SELECT s.a, r.m FROM sym s JOIN reach r ON s.b = r.node),
        |lab AS (SELECT node, min(m) AS label FROM reach GROUP BY node),
        |csz AS (SELECT label, count(*)::BIGINT AS size FROM lab
        |        GROUP BY label)
        |SELECT size, count(*)::BIGINT AS n_clusters
        |FROM csz GROUP BY size ORDER BY size""".stripMargin

  /** Multi-source BFS over the group-contracted near-dup graph: minimum
    * hop distance (≤ 3) from the seed set (every 17th group id) — the
    * "contamination blast radius" question: if these seed documents are
    * tainted (benchmark leakage, spam cluster, licensing), which template
    * families are within k near-dup hops and should be quarantined too?
    *
    * Scale: the canonical BSP frontier shape (same layout as
    * [[pageRank]]): per round ONE join of the current distance frame
    * against the symmetrized edge list and ONE min-agg, checkpointed so
    * the 3-round lineage stays flat. d_{i+1} = min(d_i ∪ expand(d_i)) —
    * re-expanding the full reached set instead of the delta frontier costs
    * one extra scan of an already-small frame and keeps the operator a
    * pure dataflow (no driver-side frontier bookkeeping); a cluster run
    * with large k switches to delta frontiers, same DAG per round.
    */
  def bfsReach(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true) // node set + both edge orientations
    val sym = pairs.select($"a".as("u"), $"b".as("v"))
      .unionByName(pairs.select($"b".as("u"), $"a".as("v")))
      .pin(true) // re-joined every round
    var dist = sym.select($"u".as("v")).distinct()
      .filter($"v" % 17 === 0)
      .select($"v", lit(0L).as("dist"))
      .pin(true)
    for (h <- 1 to 3) {
      // explicit subquery aliases on BOTH join sides: dist derives from
      // sym, so without them the rebuilt (un-pinned) plan resolves
      // sym("v") against two candidate attributes and throws
      // AnalysisException — the pinned build only worked because the
      // checkpoint minted fresh attribute ids (VERDICT r12 #3)
      dist = dist.unionByName(
          dist.as("d").join(sym.as("s"), $"d.v" === $"s.u")
            .select($"s.v".as("v"), lit(h.toLong).as("dist")))
        .groupBy($"v").agg(min($"dist").as("dist"))
        .pin(true)
    }
    dist.select($"v".as("group_id"), $"dist").orderBy($"group_id")
  }

  val bfsReachSql: String = groupGraphCte + {
    val rounds = (1 to 3).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT v, min(dist)::BIGINT AS dist FROM (
         |    SELECT v, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT s.v, d.dist + 1
         |    FROM d${i - 1} d JOIN sym s ON d.v = s.u) z
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s""", sym AS (SELECT a AS u, b AS v FROM gp
       |         UNION ALL SELECT b, a FROM gp),
       |d0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS v, 0::BIGINT AS dist FROM sym
       |  WHERE u % 17 = 0),
       |$rounds
       |SELECT v AS group_id, dist FROM d3 ORDER BY group_id""".stripMargin
  }

  /** Diameter probe by DOUBLE-SWEEP BFS (Magnien–Latapy–Habib): BFS from
    * a fixed start node, jump to the farthest node found, BFS again — the
    * second eccentricity is the standard tight lower bound on the
    * component's diameter (exact on trees, near-exact on real graphs),
    * at the cost of exactly two BFS runs instead of all-pairs. The number
    * a pipeline reads to budget iterative algorithms: PageRank mixing,
    * label-prop rounds, and contraction depth all scale with it.
    *
    * Rounds are PINNED at 6 per sweep (the oracle replays the identical
    * prefix; the gate graph's components are far shallower), so the
    * result is a lower bound twice over — by sweep count and by round
    * cap — which is exactly how the probe is used at scale. Start node =
    * the smallest group id; ties on farthest break toward the smaller
    * node, so the whole probe is deterministic.
    *
    * Scale: same per-round one-join + min-agg shape as [[bfsReach]],
    * checkpointed per round; the argmax picks are 1-row TakeOrdereds.
    */
  def diameterProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true)
    val sym = pairs.select($"a".as("u"), $"b".as("v"))
      .unionByName(pairs.select($"b".as("u"), $"a".as("v")))
      .pin(true)
    def bfs(seed: DataFrame): DataFrame = {
      var dist = seed.pin(true)
      for (h <- 1 to 6) {
        // same explicit-alias hygiene as [[bfsReach]]: survive an
        // un-pinned rebuild without relying on checkpoint-fresh ids
        dist = dist.unionByName(
            dist.as("d").join(sym.as("s"), $"d.v" === $"s.u")
              .select($"s.v".as("v"), lit(h.toLong).as("dist")))
          .groupBy($"v").agg(min($"dist").as("dist"))
          .pin(true)
      }
      dist
    }
    def far(dist: DataFrame): DataFrame =
      dist.orderBy($"dist".desc, $"v").limit(1)
    val start = sym.select($"u".as("v")).agg(min($"v").as("v"))
      .select($"v", lit(0L).as("dist"))
    val f1 = far(bfs(start)).pin(true)
    val f2 = far(bfs(f1.select($"v", lit(0L).as("dist"))))
    f1.select($"v".as("sweep1_far"), $"dist".as("sweep1_ecc"))
      .crossJoin(f2.select($"v".as("sweep2_far"),
        $"dist".as("diameter_lb")))
  }

  val diameterProbeSql: String = groupGraphCte + {
    def sweep(tag: String, seedSql: String): String = {
      val rounds = (1 to 6).map { i =>
        s"""$tag$i AS MATERIALIZED (
           |  SELECT v, min(dist)::BIGINT AS dist FROM (
           |    SELECT v, dist FROM $tag${i - 1}
           |    UNION ALL
           |    SELECT s.v, d.dist + 1
           |    FROM $tag${i - 1} d JOIN sym s ON d.v = s.u) z
           |  GROUP BY v)""".stripMargin
      }.mkString(",\n")
      s"""${tag}0 AS MATERIALIZED ($seedSql),
         |$rounds""".stripMargin
    }
    s""", sym AS (SELECT a AS u, b AS v FROM gp
       |         UNION ALL SELECT b, a FROM gp),
       |${sweep("x", "SELECT min(u) AS v, 0::BIGINT AS dist FROM sym")},
       |p1 AS (SELECT v, dist FROM x6 ORDER BY dist DESC, v LIMIT 1),
       |${sweep("y", "SELECT v, 0::BIGINT AS dist FROM p1")},
       |p2 AS (SELECT v, dist FROM y6 ORDER BY dist DESC, v LIMIT 1)
       |SELECT p1.v AS sweep1_far, p1.dist AS sweep1_ecc,
       |  p2.v AS sweep2_far, p2.dist AS diameter_lb
       |FROM p1 CROSS JOIN p2""".stripMargin
  }

  /** Approximate Neighborhood Function via HyperBall (Palmer/Gibbons/
    * Faloutsos ANF, KDD 2002; Boldi/Vigna "In-Core Computation of
    * Geometric Centralities with HyperBall", 2013 — the algorithm behind
    * the Facebook four-degrees measurement): per node of the contracted
    * near-dup graph, the ESTIMATED size of its radius-t ball for
    * t = 0..3, maintained as a 64-register HyperLogLog per node whose
    * per-round update is register-wise max over neighbors —
    * B_{t+1}(v) = B_t(v) ⊔ ⊔_{u~v} B_t(u). The per-node ball-growth
    * profile is the blast-radius/centrality read the exact per-source
    * BFS cannot deliver at scale (all-sources BFS is |V|·BFS; HyperBall
    * is |V|·64 longs per round whatever |V| is).
    *
    * Determinism & parity: registers use the [[Sketches.avalanche]]d
    * 31-bit hash and the exact dyadic estimator of
    * [[Sketches.hllDistinct]] (no linear-counting ln()), so register
    * contents — and the estimates — hash-match DuckDB bit-for-bit. The
    * raw estimator's small-n bias (visible at t=0, where every true ball
    * is 1) ships as part of the result surface, exactly as in
    * `sketch_hll_distinct`; `n_zero` accompanies each estimate for
    * callers that apply their own correction.
    *
    * Scale: per round ONE edge join + one (v, register)-keyed mergeable
    * max — the BSP register-merge shape, linear in |E| with constant 64;
    * the estimate read-off is a nodes×64 fold. Nothing is per-source.
    */
  def anfHyperball(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true)
    val sym = pairs.select($"a".as("u"), $"b".as("v"))
      .unionByName(pairs.select($"b".as("u"), $"a".as("v")))
      .pin(true)
    val nodes = sym.select($"u".as("v")).distinct().pin(true)
    val hv = Sketches.avalanche(
      Sketches.h($"v", 2654435761L, 12007L), 1779033703L, 514229L)
    var regs = nodes
      .select($"v", (hv % 64L).as("j"), floor(hv / 64L).cast("long").as("w"))
      .withColumn("mx",
        when($"w" === 0L, lit(26)).otherwise(lit(26) - length(bin($"w"))))
      .select($"v", $"j", $"mx")
      .pin(true)
    val perRound = (0 to 3).map { t =>
      if (t > 0) {
        regs = regs.unionByName(
            regs.as("r").join(sym.as("s"), $"r.v" === $"s.u")
              .select($"s.v".as("v"), $"r.j".as("j"), $"r.mx".as("mx")))
          .groupBy($"v", $"j").agg(max($"mx").as("mx"))
          .pin(true)
      }
      // readout WITHOUT the 64-way explode + left join the r16 shape
      // paid per t (4 × a |V|·64-row join): a PRESENT register always
      // has mx ≥ 1 (w = 0 maps to 26, w ≥ 1 to 26 − bitlength ≥ 1), so
      // n_zero = 64 − #present and each absent register contributes
      // exactly 2⁻⁰ = 1.0 to the sum. Every node has ≥ 1 register from
      // round 0, so the groupBy covers all nodes. Exactness: 2⁻ᵐˣ terms
      // are multiples of 2⁻²⁶ with total < 2⁶, so every partial sum is
      // exact in double — summation order cannot change est_ball.
      regs.groupBy($"v")
        .agg(count(lit(1)).as("cnt"), sum(pow(lit(2.0), -$"mx")).as("sp"))
        .select($"v".as("group_id"), lit(t.toLong).as("t"),
          (lit(64L) - $"cnt").as("n_zero"),
          floor(lit(0.709) * lit(4096.0)
            / ($"sp" + (lit(64L) - $"cnt").cast("double"))).cast("long")
            .as("est_ball"))
    }
    perRound.reduce(_ unionByName _).orderBy($"group_id", $"t")
  }

  val anfHyperballSql: String = groupGraphCte + {
    val rounds = (1 to 3).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT v, j, max(mx) AS mx FROM (
         |    SELECT v, j, mx FROM r${i - 1}
         |    UNION ALL
         |    SELECT s.v, r.j, r.mx FROM r${i - 1} r JOIN sym s ON r.v = s.u) z
         |  GROUP BY v, j)""".stripMargin
    }.mkString(",\n")
    val ests = (0 to 3).map { t =>
      s"""SELECT f.v AS group_id, $t::BIGINT AS t,
         |  sum(CASE WHEN f.mx = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
         |  floor(0.709::DOUBLE * 4096::DOUBLE
         |        / sum(pow(2.0::DOUBLE, -f.mx)))::BIGINT AS est_ball
         |FROM (SELECT nodes.v, u.j, coalesce(r$t.mx, 0) AS mx
         |      FROM nodes CROSS JOIN (SELECT unnest(range(0, 64)) AS j) u
         |      LEFT JOIN r$t ON r$t.v = nodes.v AND r$t.j = u.j) f
         |GROUP BY f.v""".stripMargin
    }.mkString("\nUNION ALL\n")
    s""", sym AS (SELECT a AS u, b AS v FROM gp
       |         UNION ALL SELECT b, a FROM gp),
       |nodes AS (SELECT DISTINCT u AS v FROM sym),
       |h1 AS (SELECT v,
       |  xor((2654435761 * v + 12007) % 2147483647,
       |      ((2654435761 * v + 12007) % 2147483647) >> 15) AS y1
       |  FROM nodes),
       |hs AS (SELECT v,
       |  xor((1779033703 * y1 + 514229) % 2147483647,
       |      ((1779033703 * y1 + 514229) % 2147483647) >> 13) AS hv
       |  FROM h1),
       |r0 AS MATERIALIZED (
       |  SELECT v, hv % 64 AS j,
       |    CASE WHEN hv // 64 = 0 THEN 26
       |         ELSE 26 - length(bin(hv // 64)) END AS mx
       |  FROM hs),
       |$rounds
       |SELECT group_id, t, n_zero, est_ball FROM (
       |$ests
       |) ORDER BY group_id, t""".stripMargin
  }

  /** Harmonic centrality (lower bound, radius ≤ 3) from the HyperBall
    * register rounds — the read HyperBall was BUILT for (Boldi & Vigna
    * 2013 compute exactly this on web-scale graphs): H(v) =
    * Σ_{t≥1} (|B_t(v)| − |B_{t−1}(v)|)/t, i.e. each newly reached node
    * weighted by 1/distance, with ball sizes from [[anfHyperball]]'s
    * estimates. Kept exact-integer as Σ ⌊1000/t⌋·(est_t − est_{t−1})
    * (weights 1000/500/333) so the ranking is bit-deterministic; the
    * truncation at t=3 makes it a lower bound, which is how the
    * centrality is consumed on graphs whose diameter exceeds the budget.
    * Estimator noise can make est_t locally dip; deltas clamp at 0
    * (a ball never shrinks — the clamp applies the known monotonicity).
    *
    * Scale: [[anfHyperball]]'s register rounds (one edge join + keyed
    * max per round) plus a per-node 4-row pivot — nothing new shuffles.
    */
  def harmonicCentrality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val anf = anfHyperball(s, dir)
    anf.groupBy($"group_id")
      .agg(
        sum(when($"t" === 0L, $"est_ball").otherwise(0L)).as("e0"),
        sum(when($"t" === 1L, $"est_ball").otherwise(0L)).as("e1"),
        sum(when($"t" === 2L, $"est_ball").otherwise(0L)).as("e2"),
        sum(when($"t" === 3L, $"est_ball").otherwise(0L)).as("e3"))
      .select($"group_id",
        (lit(1000L) * greatest($"e1" - $"e0", lit(0L))
          + lit(500L) * greatest($"e2" - $"e1", lit(0L))
          + lit(333L) * greatest($"e3" - $"e2", lit(0L)))
          .as("harmonic_x1000"))
      .orderBy($"harmonic_x1000".desc, $"group_id")
  }

  val harmonicCentralitySql: String = {
    val inner = anfHyperballSql
    s"""WITH anf AS ($inner)
       |SELECT group_id,
       |  (1000 * greatest(e1 - e0, 0) + 500 * greatest(e2 - e1, 0)
       |    + 333 * greatest(e3 - e2, 0))::BIGINT AS harmonic_x1000
       |FROM (
       |  SELECT group_id,
       |    sum(CASE WHEN t = 0 THEN est_ball ELSE 0 END) AS e0,
       |    sum(CASE WHEN t = 1 THEN est_ball ELSE 0 END) AS e1,
       |    sum(CASE WHEN t = 2 THEN est_ball ELSE 0 END) AS e2,
       |    sum(CASE WHEN t = 3 THEN est_ball ELSE 0 END) AS e3
       |  FROM anf GROUP BY group_id)
       |ORDER BY harmonic_x1000 DESC, group_id""".stripMargin
  }

  /** Poisson(1) CDF thresholds scaled to the 31-bit hash range
    * (⌊P(X≤k)·(2³¹−1)⌋ for k = 0..7): a hash-uniform u lands in bucket
    * k = #{thresholds ≤ u}, giving each (doc, replica) a deterministic
    * Poisson(1) weight — the inverse-CDF transform both engines replay
    * bit-identically. Tail truncated at 8 (P ≈ 1 − 1e-5).
    */
  private val PoissonThresholds: Seq[Long] = Seq(790015083L, 1580030167L,
    1975037709L, 2106706890L, 2139624185L, 2146207644L, 2147304887L,
    2147461637L)

  /** Poisson bootstrap of a corpus statistic (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google 2012; Kleiner et al.'s
    * BLB is the heavier cousin): instead of resampling n rows WITH
    * replacement (which needs global coordination), each (row, replica)
    * draws an independent Poisson(1) weight — for large n the replica
    * weight vector is indistinguishable from a true bootstrap resample,
    * and the statistic's spread across replicas IS its sampling
    * uncertainty. Here: 8 replicas of the mean document length
    * (integer-floored chars), weights from a deterministic hash →
    * inverse-CDF transform, so the "randomness" is replayable and the
    * oracle agrees bit-for-bit. The ONE distributed-bootstrap form that
    * needs no shuffle beyond an 8-group fold: the 100 TB way to put an
    * error bar on any scan statistic.
    *
    * Scale: corpus scan × 8 replica weights (a projection, not a join),
    * one 8-group mergeable aggregation. Nothing resamples, nothing
    * coordinates.
    */
  def poissonBootstrap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // AVALANCHED hash of the combined (doc, replica) key: an additive
    // rep term would shift u by ~1e5 of 2^31 — every replica would draw
    // nearly the SAME weights (the affine-lattice trap the HLL scaladoc
    // documents); the inverse-CDF reads u's magnitude, so it needs the
    // nonlinear rounds exactly as HLL does
    val u = Sketches.avalanche(
      Sketches.h($"doc_id" * 8L + $"rep", 2654435761L, 12007L),
      1779033703L, 514229L)
    val k = PoissonThresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(u >= t, 1L).otherwise(0L)
    }
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars".cast("long").as("nc"))
      .withColumn("rep", explode(sequence(lit(0L), lit(7L))))
      .withColumn("k", k)
      .groupBy($"rep")
      .agg(sum($"k").as("n_eff"),
        sum($"k" * $"nc").as("chars_eff"))
      .select($"rep".as("replica"), $"n_eff",
        expr("chars_eff div n_eff").as("mean_chars"))
      .orderBy($"replica")
  }

  /** The 31-bit hash modulus shared with the sketch family. */
  private val M31 = 2147483647L

  val poissonBootstrapSql: String = {
    val cases = PoissonThresholds
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH reps AS (
       |  SELECT doc_id, n_chars::BIGINT AS nc, r.rep,
       |    (2654435761 * (doc_id * 8 + r.rep) + 12007) % 2147483647 AS h1
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS rep) r),
       |av AS (
       |  SELECT rep, nc,
       |    (1779033703 * xor(h1, h1 >> 15) + 514229) % 2147483647 AS h2
       |  FROM reps),
       |hu AS (SELECT rep, nc, xor(h2, h2 >> 13) AS u FROM av),
       |wt AS (SELECT rep, nc, ($cases)::BIGINT AS k FROM hu)
       |SELECT rep AS replica, sum(k)::BIGINT AS n_eff,
       |  (sum(k * nc) // sum(k))::BIGINT AS mean_chars
       |FROM wt GROUP BY rep ORDER BY replica""".stripMargin
  }

  /** Degree ASSORTATIVITY (Newman's r) of the contracted near-dup graph:
    * the Pearson correlation of endpoint degrees over the directed edge
    * list. Because the edge list is symmetrized, the two marginals are
    * identical and r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) EXACTLY — no
    * square root, so the permille result is pure integer arithmetic.
    * Disassortative (r < 0) is the organic-web signature; strongly
    * assortative near-dup graphs indicate template families linking to
    * each other — another banding-health probe next to
    * [[componentSizes]] and [[clusteringCoeff]].
    *
    * Scale: two degree joins + one mergeable 4-sum aggregation over the
    * edge list; int64 headroom holds while m·maxdeg² < 2^63 (≈10¹²
    * edges at hub degree 10³ — beyond any contracted graph here; beyond
    * it, the sums move to DECIMAL(38)).
    */
  def assortativity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = groupPairsOf(s, dir)
      .pin(true)
    val sym = pairs.select($"a".as("u"), $"b".as("v"))
      .unionByName(pairs.select($"b".as("u"), $"a".as("v")))
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("d"))
      .pin(true) // joined at both endpoints
    val st = sym
      .join(deg.select($"u", $"d".as("x")), Seq("u"))
      .join(deg.select($"u".as("v"), $"d".as("y")), Seq("v"))
      .agg(count(lit(1)).as("m"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
    st.select($"m".as("m_edges"),
        ($"m" * $"sxy" - $"sx" * $"sx").as("num"),
        ($"m" * $"sxx" - $"sx" * $"sx").as("den"))
      .withColumn("r_pm",
        floor(lit(1000L) * $"num" / $"den").cast("long"))
  }

  val assortativitySql: String = groupGraphCte +
    """, sym AS (SELECT a AS u, b AS v FROM gp
      |         UNION ALL SELECT b, a FROM gp),
      |dg AS (SELECT u, count(*)::BIGINT AS d FROM sym GROUP BY u),
      |st AS (
      |  SELECT count(*)::BIGINT AS m, sum(dx.d)::BIGINT AS sx,
      |    sum(dx.d * dx.d)::BIGINT AS sxx,
      |    sum(dx.d * dy.d)::BIGINT AS sxy
      |  FROM sym JOIN dg dx ON sym.u = dx.u JOIN dg dy ON sym.v = dy.u)
      |SELECT m AS m_edges, (m * sxy - sx * sx)::BIGINT AS num,
      |  (m * sxx - sx * sx)::BIGINT AS den,
      |  floor(1000.0 * (m * sxy - sx * sx)
      |        / (m * sxx - sx * sx))::BIGINT AS r_pm
      |FROM st""".stripMargin

  /** k-core decomposition (k=3, 4 peel rounds) of the group-contracted
    * near-dup graph: iteratively strip nodes with degree < k until a
    * fixpoint; what survives is the dense template-family core — the spam
    * / boilerplate-farm detector of a curation pipeline (a node that
    * keeps ≥3 near-dup neighbors even after its low-degree fringe is peeled
    * sits inside a heavily templated region, exactly where aggressive
    * dedup/downweighting pays off; the sparse fringe is organic text).
    *
    * Output: the 3-core membership with each survivor's degree in the
    * final peeled edge set.
    *
    * Scale: each peel round is ONE mergeable degree count plus two
    * node-keyed semi-joins of the edge list — the same per-round
    * join+agg bound as [[pageRank]]/[[bfsReach]], checkpointed per round
    * so the 4-round lineage stays flat. The round count is pinned (4) so
    * the oracle replays the identical prefix; peeling monotonically
    * shrinks the edge set, so a fixpoint reached early makes the
    * remaining rounds no-ops over the final set (same answer, wasted
    * passes only — a cluster run loops with a convergence counter the
    * way [[starContraction]] does).
    */
  def kcore(s: SparkSession, dir: String, k: Int = 3,
      rounds: Int = 4): DataFrame = {
    import s.implicits._
    var edges = groupPairsOf(s, dir).pin(true)
    for (_ <- 1 to rounds) {
      val deg = edges.select($"a".as("v"))
        .unionByName(edges.select($"b".as("v")))
        .groupBy($"v").agg(count(lit(1)).as("d"))
      val keep = deg.filter($"d" >= k).select($"v")
      edges = edges
        .join(keep.select($"v".as("a")), Seq("a"), "left_semi")
        .join(keep.select($"v".as("b")), Seq("b"), "left_semi")
        .select($"a", $"b").pin(true)
    }
    edges.select($"a".as("v")).unionByName(edges.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("core_deg"))
      .select($"v".as("group_id"), $"core_deg")
      .orderBy($"group_id")
  }

  val kcoreSql: String = groupGraphCte + {
    val rounds = (1 to 4).map { r =>
      s""", nd$r AS (SELECT a AS v FROM e${r - 1} UNION ALL
         |           SELECT b FROM e${r - 1}),
         |dg$r AS (SELECT v, count(*)::BIGINT AS d FROM nd$r GROUP BY v),
         |kp$r AS (SELECT v FROM dg$r WHERE d >= 3),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN kp$r ka ON e.a = ka.v JOIN kp$r kb ON e.b = kb.v)""".stripMargin
    }.mkString
    s""", e0 AS MATERIALIZED (SELECT a, b FROM gp)$rounds,
       |ndf AS (SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4)
       |SELECT v AS group_id, count(*)::BIGINT AS core_deg
       |FROM ndf GROUP BY v ORDER BY group_id""".stripMargin
  }

  /** Collocation mining: token pairs co-occurring within a forward window
    * of 3 positions, ranked by LIFT = P(ab)/(P(a)·P(b)) — the
    * phrase/multi-word-expression detector a tokenizer-training or
    * corpus-analysis pass runs (the word2vec co-occurrence matrix's
    * strongest off-diagonal entries). Lift, not PMI: identical ranking
    * (log is monotone) with NO transcendental call, so the score is one
    * exact-integer ratio — n_ab·N² / (T·n_a·n_b) on int64 — and the
    * rounded double is bit-identical across engines.
    *
    * Scale: pair emission is O(window · tokens) via per-doc `lead`s (the
    * shingle idiom — never a positional self-join, which is O(L²) per
    * doc); everything after is mergeable counting on (a,b) / (w) keys.
    * The min-support filter (n_ab ≥ 5) lands before the unigram joins,
    * so the long tail of hapax pairs never reaches a shuffle. The int64
    * numerator bounds the corpus at N² · n_ab < 2⁶³ (N ≲ 3·10⁷ tokens
    * per exact-arithmetic shard); beyond that a deployment shards the
    * count tables and lifts to floats — ranking, not the gate contract,
    * is what survives the switch.
    */
  def cooccurLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .pin(true) // pair emit + unigram counts + total
    val prs = toks
      .withColumn("w1", lead($"w", 1).over(dw))
      .withColumn("w2", lead($"w", 2).over(dw))
      .withColumn("w3", lead($"w", 3).over(dw))
      .select($"w", explode(array($"w1", $"w2", $"w3")).as("x"))
      .filter($"x".isNotNull)
      .select(least($"w", $"x").as("a"), greatest($"w", $"x").as("b"))
      .pin(true) // pair counts + total
    val nab = prs.groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 5)
    val uni = toks.groupBy($"w").agg(count(lit(1)).as("n_w"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val nPair = prs.agg(count(lit(1)).as("n_pair"))
    val scored = nab
      .join(uni.select($"w".as("a"), $"n_w".as("n_a")), "a")
      .join(uni.select($"w".as("b"), $"n_w".as("n_b")), "b")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nPair))
      .withColumn("lift",
        round(($"n_ab" * $"n_tok" * $"n_tok").cast("double")
          / ($"n_pair" * $"n_a" * $"n_b").cast("double"), 4))
    val top = scored.orderBy($"lift".desc, $"a", $"b").limit(20)
    top.select($"a", $"b", $"n_ab", $"lift",
        row_number().over(Window.orderBy($"lift".desc, $"a", $"b"))
          .as("rnk")) // 20-row frame
      .orderBy($"rnk")
  }

  val cooccurLiftSql: String =
    """WITH toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |ld AS (
      |  SELECT w, lead(w, 1) OVER dw AS w1, lead(w, 2) OVER dw AS w2,
      |         lead(w, 3) OVER dw AS w3
      |  FROM toks WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |prs AS (
      |  SELECT least(w, x) AS a, greatest(w, x) AS b FROM (
      |    SELECT w, unnest([w1, w2, w3]) AS x FROM ld) z
      |  WHERE x IS NOT NULL),
      |nab AS (
      |  SELECT a, b, count(*)::BIGINT AS n_ab FROM prs GROUP BY 1, 2
      |  HAVING count(*) >= 5),
      |uni AS (SELECT w, count(*)::BIGINT AS n_w FROM toks GROUP BY 1),
      |tt AS (SELECT count(*)::BIGINT AS n_tok FROM toks),
      |tp AS (SELECT count(*)::BIGINT AS n_pair FROM prs),
      |scored AS (
      |  SELECT a, b, n_ab,
      |    round((n_ab * n_tok * n_tok)::DOUBLE
      |      / (n_pair * ua.n_w * ub.n_w)::DOUBLE, 4) AS lift
      |  FROM nab JOIN uni ua ON nab.a = ua.w
      |           JOIN uni ub ON nab.b = ub.w
      |  CROSS JOIN tt CROSS JOIN tp),
      |top AS (SELECT * FROM scored ORDER BY lift DESC, a, b LIMIT 20)
      |SELECT a, b, n_ab, lift,
      |  row_number() OVER (ORDER BY lift DESC, a, b) AS rnk
      |FROM top ORDER BY rnk""".stripMargin

  /** Inverted-index build: per term, document frequency and the first 20
    * postings (sorted doc_ids, rendered as a canonical comma string so the
    * oracle compare is exact on both engines). The retrieval-side
    * counterpart of [[tfidfTerms]] — postings are what a search/dedup
    * service serves.
    *
    * Scale: the posting CAP is applied BEFORE aggregation (a per-term
    * row_number over the term-keyed shuffle keeps only rank ≤ 20), so the
    * collect_list is bounded at 20 elements per term no matter how hot the
    * term — an uncapped collect_list over a stopword's postings would
    * materialize one array the size of the corpus. df is the full count
    * from the same shuffle. At real scale postings beyond the cap shard
    * into bucketed segment files instead (this query is the index CONTRACT;
    * the storage layout is [[graft.sources.VersionedTable]]'s job).
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    tokens(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"w").orderBy($"doc_id")))
      .groupBy($"w".as("term"))
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(when($"rn" <= 20, $"doc_id"))),
          ",").as("postings"))
      .orderBy($"term")
  }

  val invertedIndexSql: String =
    """WITH tok AS (SELECT DISTINCT doc_id, w FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))
      |SELECT w AS term, count(*)::BIGINT AS df,
      |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
      |FROM tok GROUP BY w ORDER BY term""".stripMargin

  /** SimHash (16-bit): per token-hash bit, ±1 votes over the distinct token
    * set; sign of each bit-sum forms the fingerprint. Near-dup docs differ
    * in few bits. Pure integer arithmetic (floor-div instead of dynamic
    * shifts, which Spark's shiftright can't do with a column shift amount).
    */
  /** Unordered (doc_id, simhash) frame shared by the signature query and
    * the pairs query.
    */
  private def simhashRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = ((lit(A(0)) * tokenCode($"w") + B(0)) % P).as("h")
    val bits = tokens(s, dir).select($"doc_id", h)
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("bit", floor($"h" / pow(lit(2.0), $"b")).cast("long") % 2)
      .groupBy($"doc_id", $"b")
      .agg(sum(when($"bit" === 1, 1L).otherwise(-1L)).as("vote"))
    bits.groupBy($"doc_id")
      .agg(sum(when($"vote" > 0,
        pow(lit(2.0), $"b").cast("long")).otherwise(0L)).as("simhash"))
  }

  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashRaw(s, dir).orderBy($"doc_id")
  }

  /** CTE prefix ending in `sh(doc_id, simhash)` — shared by the signature
    * and pairs oracles.
    */
  private val simhashCte: String = tokCte +
    """, hs AS (SELECT doc_id, (1103 * code + 12007) % 2147483647 AS h FROM codes),
      |votes AS (
      |  SELECT doc_id, b,
      |    sum(CASE WHEN floor(h / power(2, b))::BIGINT % 2 = 1
      |             THEN 1 ELSE -1 END) AS vote
      |  FROM hs CROSS JOIN range(16) t(b) GROUP BY doc_id, b),
      |sh AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN vote > 0 THEN power(2, b)::BIGINT ELSE 0 END)::BIGINT
      |      AS simhash
      |  FROM votes GROUP BY doc_id)
      |""".stripMargin

  val simhashSql: String = simhashCte +
    "SELECT doc_id, simhash FROM sh ORDER BY doc_id"

  /** SimHash near-duplicate pairs at Hamming distance ≤ 1, found by
    * pigeonhole banding: split the 16-bit signature into two bytes — a
    * pair within distance 1 differs in at most one byte, so it MUST agree
    * exactly on the other. Candidates come from equi-joins on (band,
    * byte) buckets (the scalable LSH-style shape — never all-pairs), then
    * the exact Hamming filter keeps true neighbors. The oracle is the
    * naive all-pairs definition, so the gate also proves the banding loses
    * nothing. bit_count(xor) is codegen'd in Spark and vectorized in
    * DuckDB.
    *
    * DIAGNOSTIC — saturation baseline, not a production operator (listed
    * in `SparkEntry.diagnostic`). The PLAN is sound (identical banded join
    * to [[simhashWidePairs]]) but the 16-bit SIGNATURE WIDTH saturates
    * once the corpus outgrows its 65,536-value space: PLANS.md's scaling
    * table measured ×71 emitted pairs for ×10 docs — birthday collisions,
    * not duplicates — so beyond ~50k docs output grows ~quadratically.
    * Kept deliberately as the measured width-saturation case the 62-bit
    * wide variant is judged against; use [[simhashWidePairs]] on real
    * corpora and exclude this one from scaled benchmarks.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // materialize the n_docs×2 signature frame: both self-join sides fan
    // out from it, and without the checkpoint the tokenize + 16-bit vote
    // aggregation pipeline runs twice (same defect class as minhashPairs);
    // first-matching-band emission (see minhashPairs) replaces the pair
    // distinct with a filter — band 1 emits only key-0 non-matches. The
    // band-0 keys are recomputed from sa/sb INSIDE the filter (a couple
    // of ALU ops per joined row) instead of riding the explode + exchange
    // as extra columns: the signatures are already carried for the
    // Hamming check, and widening the shuffled rows was measured to cost
    // more than the distinct it replaced on the wide variant.
    val banded = simhashRaw(s, dir).pin(true)
      .select($"doc_id", $"simhash", explode(array(
        struct(lit(0).as("band"), ($"simhash" % 256L).as("key")),
        struct(lit(1).as("band"), shiftright($"simhash", 8).as("key"))))
        .as("e"))
      .select($"doc_id", $"simhash", $"e.band", $"e.key")
    val l = banded.select($"doc_id".as("a"), $"simhash".as("sa"),
      $"band", $"key")
    val r = banded.select($"doc_id".as("b"), $"simhash".as("sb"),
      $"band", $"key")
    l.join(r, Seq("band", "key"))
      .filter($"a" < $"b" &&
        ($"band" === 0 || ($"sa" % 256L) =!= ($"sb" % 256L)))
      .select($"a", $"b",
        bit_count($"sa".bitwiseXOR($"sb")).cast("long").as("hamming"))
      .filter($"hamming" <= 1)
      .orderBy($"a", $"b")
  }

  val simhashPairsSql: String = simhashCte +
    """SELECT a.doc_id AS a, b.doc_id AS b,
      |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
      |ORDER BY a, b""".stripMargin

  /** WIDE SimHash (62-bit) near-dup pairs at Hamming ≤ 3 — the
    * production-width configuration of [[simhashPairs]]. A 16-bit
    * fingerprint saturates once the corpus outgrows its 65,536 signature
    * space (measured: ×71 emitted pairs for ×10 docs on the scaling
    * corpus — birthday collisions, not true duplicates); at 62 bits the
    * space is ~4.6e18, so bucket density — and with it output volume — is
    * set by the data's true duplication at any realistic corpus size.
    * Two independent AVALANCHED 31-bit hashes supply the bit votes (bits
    * 0–30 from h1, 31–61 from h2; every 2^b stays exact, the signature
    * < 2^62). Avalanching (affine → xor-shift → affine → xor-shift, the
    * [[Sketches]] HLL construction; products < 2^63 exact in both
    * engines) is load-bearing exactly as it was for HLL: simhash reads
    * the hash's BIT PATTERN, and under a plain affine map two token sets
    * whose codes differ by a small constant (e.g. vocabulary variants
    * differing in one trailing character) get hashes with correlated high
    * bits — measured on the scaling corpus, that correlation alone pushed
    * disjoint-vocabulary shards within Hamming 3 of each other and
    * re-inflated pairs ~quadratically even at 62 bits.
    * Pigeonhole: 4 bands (16+16+15+15 bits) — a pair within Hamming 3
    * must agree exactly on ≥ 1 band, so the (band, key) equi-join loses
    * nothing, which the naive all-pairs oracle proves at the gate.
    */
  private def simhashWideRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Sketches.avalanche is the one shared copy of the xorshift finisher
    // (Sketches' modulus M equals P — both are 2^31 − 1)
    val code = tokenCode($"w")
    val h1 = Sketches.avalanche((lit(A(0)) * code + B(0)) % P,
      1779033703L, 514229L)
    val h2 = Sketches.avalanche((lit(A(1)) * code + B(1)) % P,
      2654435761L, 12007L)
    val bits = tokens(s, dir)
      .select($"doc_id", h1.as("h1"), h2.as("h2"))
      .select($"doc_id", $"h1", $"h2",
        explode(sequence(lit(0), lit(61))).as("b"))
      .withColumn("bit",
        when($"b" < 31, floor($"h1" / pow(lit(2.0), $"b")).cast("long") % 2)
          .otherwise(floor($"h2" / pow(lit(2.0), $"b" - 31)).cast("long") % 2))
      .groupBy($"doc_id", $"b")
      .agg(sum(when($"bit" === 1, 1L).otherwise(-1L)).as("vote"))
    bits.groupBy($"doc_id")
      .agg(sum(when($"vote" > 0,
        pow(lit(2.0), $"b").cast("long")).otherwise(0L)).as("simhash"))
  }

  def simhashWidePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // same materialization rationale as simhashPairs: both join sides fan
    // out of the signature frame. First-matching-band emission over 4
    // bands: band b emits only pairs whose bands 0..b−1 all differ, so no
    // pair distinct is needed. The earlier-band keys are recomputed from
    // sa/sb inside the post-join filter (shift+mask per row) rather than
    // carried through the explode + exchange — carrying k0..k2 as 3 extra
    // longs per banded row was measured to cost MORE at 10× (14.8s) than
    // the distinct it replaced (8.9s); deriving them from the already-
    // carried signatures keeps the shuffled rows at their original width.
    val banded = simhashWideRaw(s, dir).pin(true)
      .select($"doc_id", $"simhash", explode(array(
          struct(lit(0).as("band"),
            $"simhash".bitwiseAND(65535L).as("key")),
          struct(lit(1).as("band"),
            shiftright($"simhash", 16).bitwiseAND(65535L).as("key")),
          struct(lit(2).as("band"),
            shiftright($"simhash", 32).bitwiseAND(32767L).as("key")),
          struct(lit(3).as("band"), shiftright($"simhash", 47).as("key"))))
        .as("e"))
      .select($"doc_id", $"simhash", $"e.band", $"e.key")
    val l = banded.select($"doc_id".as("a"), $"simhash".as("sa"),
      $"band", $"key")
    val r = banded.select($"doc_id".as("b"), $"simhash".as("sb"),
      $"band", $"key")
    def kne(shift: Int, mask: Long): Column =
      shiftright($"sa", shift).bitwiseAND(mask) =!=
        shiftright($"sb", shift).bitwiseAND(mask)
    l.join(r, Seq("band", "key"))
      .filter($"a" < $"b" && ($"band" === 0 ||
        ($"band" === 1 && kne(0, 65535L)) ||
        ($"band" === 2 && kne(0, 65535L) && kne(16, 65535L)) ||
        ($"band" === 3 && kne(0, 65535L) && kne(16, 65535L)
          && kne(32, 32767L))))
      .select($"a", $"b",
        bit_count($"sa".bitwiseXOR($"sb")).cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .orderBy($"a", $"b")
  }

  /** Naive all-pairs oracle over the 62-bit signatures — also the
    * losslessness proof for the 4-band pigeonhole join.
    */
  val simhashWidePairsSql: String = tokCte +
    s""", hs0 AS (
       |  SELECT doc_id,
       |    (${A(0)} * code + ${B(0)}) % 2147483647 AS x1,
       |    (${A(1)} * code + ${B(1)}) % 2147483647 AS x2
       |  FROM codes),
       |hs1 AS (
       |  SELECT doc_id,
       |    (1779033703 * xor(x1, x1 >> 15) + 514229) % 2147483647 AS z1,
       |    (2654435761 * xor(x2, x2 >> 15) + 12007) % 2147483647 AS z2
       |  FROM hs0),
       |hs AS (
       |  SELECT doc_id, xor(z1, z1 >> 13) AS h1, xor(z2, z2 >> 13) AS h2
       |  FROM hs1),
       |votes AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (CASE WHEN b < 31
       |                   THEN floor(h1 / power(2, b))::BIGINT
       |                   ELSE floor(h2 / power(2, b - 31))::BIGINT
       |              END) % 2 = 1
       |        THEN 1 ELSE -1 END) AS vote
       |  FROM hs CROSS JOIN range(62) t(b) GROUP BY doc_id, b),
       |sh AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN vote > 0 THEN power(2, b)::BIGINT ELSE 0 END)::BIGINT
       |      AS simhash
       |  FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY a, b""".stripMargin

  /** Top-5 character trigrams per language by frequency — the n-gram
    * statistics pass a language-ID / contamination-analysis pipeline runs
    * over a corpus. Trigram explosion is a per-row generator (no shuffle);
    * the count is one agg shuffle on (lang, gram) with map-side partials;
    * the top-k rides the engine's own bounded-heap
    * [[graft.plans.GroupedTopK]] operator instead of a full window sort, so
    * the post-agg sort state is O(k · langs), not O(distinct grams) —
    * the 100 TB shape. Ties break on gram DESC (the operator is
    * largest-first lexicographic on its order columns).
    */
  def ngramTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = charTrigrams(s, dir)
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("cnt"))
    graft.plans.GroupedTopK(grams,
      groupCols = Seq("lang"), orderCols = Seq("cnt", "gram"), k = 5)
      .orderBy($"lang", $"cnt".desc, $"gram".desc)
  }

  val ngramTopKSql: String =
    """SELECT lang, gram, cnt FROM (
      |  SELECT lang, gram, cnt,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY cnt DESC, gram DESC) AS rn
      |  FROM (
      |    SELECT lang, substr(text, i::INT, 3) AS gram, count(*)::BIGINT AS cnt
      |    FROM (SELECT lang, text, unnest(range(1, length(text) - 1)) AS i
      |          FROM documents WHERE length(text) >= 3) x
      |    GROUP BY lang, gram) g) t
      |WHERE rn <= 5
      |ORDER BY lang, cnt DESC, gram DESC""".stripMargin

  /** Keyword extraction: top-3 terms per document by tf-major ranking —
    * tf DESC (frequent in this doc), df ASC (rare in the corpus) as the
    * tie-break, term ASC last. This is a deterministic integer SURROGATE
    * for tf·idf, not the tf·idf ordering itself (a rarer term with lower
    * tf can out-score a commoner term under tf·log(N/df); here tf always
    * wins first) — chosen because it is exactly reproducible across
    * engines with zero float risk, which real tf·idf's log() is not.
    * Shape: explode (no shuffle) → tf agg → df agg (vocab-sized,
    * broadcast back) → per-doc window. The df frame is bounded by
    * vocabulary, not corpus, so the join stays broadcast at any scale.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val terms = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    // tf feeds BOTH the df aggregate and the ranking join — materialize it
    // so the corpus explode+agg runs once, not once per reference
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .pin(true)
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    tf.join(broadcast(df), "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"term", $"tf", $"df", $"rank")
      .orderBy($"doc_id", $"rank")
  }

  val tfidfTopTermsSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
      |       FROM terms GROUP BY doc_id, term),
      |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
      |SELECT doc_id, term, tf, df, rank FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)::BIGINT AS rank
      |  FROM tf JOIN df ON tf.term = df.term) t
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Sequence packing, concat-and-chunk style: within each source shard,
    * documents are concatenated in stable doc_id order and cut into
    * 2048-token bins — each doc's bin is floor(tokens-before-it / 2048),
    * exactly the pretraining packer's accounting. The running sum windows
    * per SOURCE (the shard key), so packing parallelizes across shards
    * instead of serializing on a global order — a global cumsum is the one
    * window no 1000-executor cluster should ever run.
    */
  /** Per-document bin assignment over an arbitrary document frame — the
    * DataFrame-to-DataFrame form pipelines compose with (the query below
    * is its per-bin accounting at the default 2048-token bin size).
    * Returns (source, doc_id, n_tokens, bin).
    */
  def packSequencesOf(docs: DataFrame, binTokens: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tokens = (length($"text")
      - length(regexp_replace($"text", lit(" "), lit(""))) + 1).cast("long")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select($"source", $"doc_id", tokens.as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum($"n_tokens").over(w), lit(0L)) / binTokens.toDouble)
          .cast("long"))
  }

  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packSequencesOf(Tables.documents(s, dir), 2048L)
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"bin")
  }

  val packSequencesSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id,
      |    (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
      |      AS n_tokens
      |  FROM documents),
      |binned AS (
      |  SELECT source, doc_id, n_tokens,
      |    floor(coalesce(sum(n_tokens) OVER (PARTITION BY source
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) / 2048.0)::BIGINT AS bin
      |  FROM toks)
      |SELECT source, bin, count(*)::BIGINT AS n_docs,
      |  sum(n_tokens)::BIGINT AS sum_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM binned GROUP BY source, bin ORDER BY source, bin""".stripMargin

  /** Context-length sweep of [[packSequencesOf]]'s fragmentation cost:
    * at each candidate training context length L, how many documents a
    * concat-and-chunk packer SPLITS across sequence boundaries (a doc
    * crosses iff its start and last token land in different L-bins) and
    * how many extra cuts long documents absorb — the curve a pretraining
    * team reads before fixing L, since every seam is a document whose
    * attention window sees two unrelated texts. The per-source token
    * cumsum is computed ONCE (the same source-keyed window as the
    * packer — never a global order); the L axis is a 5-value explode
    * over that frame, pure arithmetic per row, folded to one 5-row
    * report. Exact integers throughout.
    */
  def packFragmentation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tokens = (length($"text")
      - length(regexp_replace($"text", lit(" "), lit(""))) + 1).cast("long")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"source", $"doc_id", tokens.as("n_tokens"))
      .withColumn("start", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("ctx_len",
        explode(array(Seq(128L, 256L, 512L, 1024L, 2048L).map(lit): _*)))
      .select($"ctx_len", $"source",
        expr("start div ctx_len").as("b0"),
        expr("(start + n_tokens - 1) div ctx_len").as("b1"))
      .groupBy($"ctx_len", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"b1" > $"b0", 1L).otherwise(0L)).as("docs_split"),
        sum($"b1" - $"b0").as("extra_cuts"),
        (max($"b1") + 1L).as("bins"))
      .groupBy($"ctx_len")
      .agg(sum($"n_docs").as("n_docs"), sum($"bins").as("n_bins"),
        sum($"docs_split").as("docs_split"),
        sum($"extra_cuts").as("extra_cuts"))
      .select($"ctx_len", $"n_docs", $"n_bins", $"docs_split",
        $"extra_cuts",
        expr("(1000 * docs_split) div n_docs").as("frag_pm"))
      .orderBy($"ctx_len")
  }

  val packFragmentationSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id,
      |    (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
      |      AS n_tokens
      |  FROM documents),
      |cum AS (
      |  SELECT source, doc_id, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0)::BIGINT AS start
      |  FROM toks),
      |sw AS (
      |  SELECT l.ctx_len, source,
      |    (start // l.ctx_len) AS b0,
      |    ((start + n_tokens - 1) // l.ctx_len) AS b1
      |  FROM cum CROSS JOIN
      |    (SELECT unnest([128, 256, 512, 1024, 2048]) AS ctx_len) l),
      |per_src AS (
      |  SELECT ctx_len, source, count(*)::BIGINT AS n_docs,
      |    sum(CASE WHEN b1 > b0 THEN 1 ELSE 0 END)::BIGINT AS docs_split,
      |    sum(b1 - b0)::BIGINT AS extra_cuts,
      |    (max(b1) + 1)::BIGINT AS bins
      |  FROM sw GROUP BY 1, 2)
      |SELECT ctx_len::BIGINT AS ctx_len, sum(n_docs)::BIGINT AS n_docs,
      |  sum(bins)::BIGINT AS n_bins,
      |  sum(docs_split)::BIGINT AS docs_split,
      |  sum(extra_cuts)::BIGINT AS extra_cuts,
      |  ((1000 * sum(docs_split)) // sum(n_docs))::BIGINT AS frag_pm
      |FROM per_src GROUP BY 1 ORDER BY ctx_len""".stripMargin

  /** Benchmark decontamination: flag every training document sharing at
    * least one 3-word shingle with the held-out eval set (source `src0`
    * stands in for the benchmark). Each split is shingled SEPARATELY —
    * the eval side shingles only its own tiny slice, never a full-corpus
    * pass. Shingling the training side costs the per-doc window + distinct
    * any shingle pipeline pays; after that the contamination probe itself
    * is a broadcast join against the DISTINCT'd eval shingles (benchmarks
    * are tiny by definition), so no extra big-side shuffle. Reuses the
    * exact shingle codes of the dedup pipeline, so "contaminated" and
    * "near-duplicate" agree on what a shingle is.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decontaminateOf(s, dir).orderBy($"doc_id")
  }

  /** Unsorted contamination frame shared by [[decontaminate]] and
    * [[keepManifest]] (same sort-under-join rationale as gopherRulesOf).
    */
  private def decontaminateOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val evalCodes = shingleCodesOf(docs.filter($"source" === "src0"))
      .select($"code").distinct()
    val train = docs.filter($"source" =!= "src0")
    val hits = shingleCodesOf(train)
      .join(broadcast(evalCodes), "code")
      // shingle codes are distinct per doc upstream, so plain count IS the
      // distinct shared-shingle count
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    train.select($"doc_id").join(hits, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_shared", lit(0L)).as("n_shared"),
        when($"n_shared".isNotNull, 1L).otherwise(0L).as("contaminated"))
  }

  val decontaminateSql: String = shingleCte +
    """, ec AS (
      |  SELECT DISTINCT code FROM codes
      |  JOIN documents USING (doc_id) WHERE source = 'src0'),
      |train AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
      |hits AS (
      |  SELECT c.doc_id, count(*)::BIGINT AS n_shared
      |  FROM codes c JOIN train t ON c.doc_id = t.doc_id
      |  JOIN ec ON c.code = ec.code
      |  GROUP BY c.doc_id)
      |SELECT t.doc_id, coalesce(h.n_shared, 0)::BIGINT AS n_shared,
      |  (CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS contaminated
      |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---- unigram-LM surprisal (quality filtering) ----

  /** CCNet-style LM quality scoring (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * score each document by its average per-token surprisal under a
    * unigram LM fitted on the corpus itself — the standard
    * perplexity-bucket signal for filtering/stratifying training data
    * (low = repetitive/common vocabulary, high = rare/noisy).
    *
    * Cross-engine exactness forbids ln()/log2() (libm last-ulp behavior is
    * engine-specific — the HLL scaladoc's reason for dropping its linear-
    * counting branch), so surprisal is quantized to INTEGER BITS:
    * bits(token) = bitlength(⌊N/cnt⌋) ≈ log2(N/cnt)+1, via the same
    * `length(bin(x))` idiom HLL's rank uses. 1-bit resolution is coarse
    * per token but the per-doc mean (reported in millibits) separates
    * quality buckets exactly as well at corpus scale; a float refinement
    * is a client-side divide over the shipped integer sums.
    *
    * Scale shape: token STREAM (not the distinct set — a unigram LM counts
    * occurrences), one map-side-combinable count per code builds the LM,
    * one equi-join + aggregation scores all docs; the 1-row corpus total
    * rides a broadcast. No driver collect, no per-doc state.
    */
  def textSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stream = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .select($"doc_id", tokenCode($"w").as("code"))
    val lm = stream.groupBy($"code").agg(count(lit(1)).as("cnt"))
    val total = lm.agg(sum($"cnt").as("n_total"))
    stream.join(lm, Seq("code"))
      .crossJoin(broadcast(total))
      // ⌊N/cnt⌋ ≥ 1 always (cnt ≤ N), so bin() never sees 0 here; the
      // double division is exact (both operands < 2^53)
      .withColumn("bits",
        length(bin(floor($"n_total" / $"cnt").cast("long"))).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"bits").as("surprisal_bits"))
      .withColumn("mean_millibits",
        floor($"surprisal_bits" * 1000L / $"n_tokens").cast("long"))
      .orderBy($"doc_id")
  }

  val textSurprisalSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |cs AS (SELECT doc_id, $tokenCodeSql AS code FROM ts),
       |lm AS (SELECT code, count(*)::BIGINT AS cnt FROM cs GROUP BY code),
       |tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM lm),
       |sc AS (
       |  SELECT doc_id, length(bin(n_total // cnt))::BIGINT AS bits
       |  FROM cs JOIN lm USING (code) CROSS JOIN tot)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  sum(bits)::BIGINT AS surprisal_bits,
       |  ((sum(bits)::BIGINT * 1000) // count(*))::BIGINT AS mean_millibits
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram-LM surprisal — the second-order refinement of
    * [[textSurprisal]]: score each doc by its mean CONDITIONAL surprisal
    * bits(w2 | w1) = bitlength(⌊cnt(w1·)/cnt(w1,w2)⌋) under a bigram LM
    * fitted on the corpus itself. A unigram model can't see scrambled or
    * templated word order; the bigram conditional is the cheapest signal
    * that can (real prose scores low, shuffled/keyword-stuffed text
    * high). Same integer-bits quantization as the unigram query (libm-free
    * ⇒ bit-exact cross-engine); cnt(w1·) ≥ cnt(w1,w2) always, so the
    * ratio is ≥ 1 and bin() never sees 0.
    *
    * Scale shape: bigrams are formed per-row by zipping adjacent array
    * slices (NO positional self-join on the Spark side — pairing is free
    * map work), then one map-side-combinable count builds each LM level
    * and one equi-join + agg scores all docs. The bigram stream feeds
    * three consumers (both LM fits + the scoring join), so it is
    * materialized once. Docs with fewer than two tokens surface with
    * n_bigrams = 0 via the left join — they are unscorable, not missing.
    */
  def bigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arr = split($"text", " ")
    val bg = Tables.documents(s, dir)
      .select($"doc_id", explode(arrays_zip(
        slice(arr, lit(1), size(arr) - 1).as("a"),
        slice(arr, lit(2), size(arr) - 1).as("b"))).as("p"))
      .select($"doc_id", tokenCode($"p.a").as("c1"), tokenCode($"p.b").as("c2"))
      .pin(true)
    val lm2 = bg.groupBy($"c1", $"c2").agg(count(lit(1)).as("cnt2"))
    val lm1 = bg.groupBy($"c1").agg(count(lit(1)).as("cnt1"))
    val scored = bg.join(lm2, Seq("c1", "c2")).join(lm1, Seq("c1"))
      .withColumn("bits",
        length(bin(floor($"cnt1" / $"cnt2").cast("long"))).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nb"), sum($"bits").as("sb"))
    Tables.documents(s, dir).select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"nb", lit(0L)).as("n_bigrams"),
        coalesce($"sb", lit(0L)).as("surprisal_bits"))
      .withColumn("mean_millibits",
        when($"n_bigrams" > 0,
          floor($"surprisal_bits" * 1000L / $"n_bigrams"))
          .otherwise(0L).cast("long"))
      .orderBy($"doc_id")
  }

  val bigramSurprisalSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |ts AS (SELECT doc_id, i.i AS pos, l[i.i] AS w
       |       FROM d, LATERAL (SELECT unnest(range(1, len(d.l) + 1)) AS i) i),
       |cs AS (SELECT doc_id, pos, $tokenCodeSql AS code FROM ts),
       |bg AS (SELECT a.doc_id, a.code AS c1, b.code AS c2
       |       FROM cs a JOIN cs b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |lm2 AS (SELECT c1, c2, count(*)::BIGINT AS cnt2 FROM bg GROUP BY c1, c2),
       |lm1 AS (SELECT c1, count(*)::BIGINT AS cnt1 FROM bg GROUP BY c1),
       |sc AS (
       |  SELECT doc_id, length(bin(cnt1 // cnt2))::BIGINT AS bits
       |  FROM bg JOIN lm2 USING (c1, c2) JOIN lm1 USING (c1)),
       |agg AS (SELECT doc_id, count(*)::BIGINT AS nb, sum(bits)::BIGINT AS sb
       |        FROM sc GROUP BY doc_id)
       |SELECT doc.doc_id,
       |  coalesce(nb, 0)::BIGINT AS n_bigrams,
       |  coalesce(sb, 0)::BIGINT AS surprisal_bits,
       |  CASE WHEN coalesce(nb, 0) > 0 THEN (sb * 1000) // nb
       |       ELSE 0 END::BIGINT AS mean_millibits
       |FROM documents doc LEFT JOIN agg ON doc.doc_id = agg.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  /** CCNet's perplexity-bucket ACTION (Wenzek et al., LREC 2020 §4.3):
    * split each language's documents into head/middle/tail terciles by LM
    * surprisal — the standard curation move after scoring (keep head,
    * resample middle, drop or down-weight tail). Scores come from the same
    * integer-bits unigram LM as [[textSurprisal]]; the tercile is one
    * ntile(3) window per language over the deterministic total order
    * (mean_millibits, doc_id), so bucket boundaries are exactly
    * reproducible cross-engine (both engines give the first n mod 3
    * buckets the extra row).
    *
    * Scale shape: the scoring pass is [[textSurprisal]]'s (stream → LM →
    * join back); the bucketing adds ONE window partitioned by language —
    * at 100 TB that window's shuffle is per-language and the per-partition
    * state is a row counter, not a buffer.
    */
  def pplBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val stream = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .select($"doc_id", tokenCode($"w").as("code"))
    val lm = stream.groupBy($"code").agg(count(lit(1)).as("cnt"))
    val total = lm.agg(sum($"cnt").as("n_total"))
    val scored = stream.join(lm, Seq("code"))
      .crossJoin(broadcast(total))
      .withColumn("bits",
        length(bin(floor($"n_total" / $"cnt").cast("long"))).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"bits").as("sb"))
      .withColumn("mean_millibits",
        floor($"sb" * 1000L / $"n_tokens").cast("long"))
    scored
      .join(Tables.documents(s, dir).select($"doc_id", $"lang"), Seq("doc_id"))
      .withColumn("tercile", ntile(3).over(
        Window.partitionBy($"lang").orderBy($"mean_millibits", $"doc_id")))
      .select($"doc_id", $"lang", $"mean_millibits",
        when($"tercile" === 1, "head").when($"tercile" === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy($"doc_id")
  }

  val pplBucketsSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |cs AS (SELECT doc_id, $tokenCodeSql AS code FROM ts),
       |lm AS (SELECT code, count(*)::BIGINT AS cnt FROM cs GROUP BY code),
       |tot AS (SELECT sum(cnt)::BIGINT AS n_total FROM lm),
       |sc AS (
       |  SELECT doc_id, length(bin(n_total // cnt))::BIGINT AS bits
       |  FROM cs JOIN lm USING (code) CROSS JOIN tot),
       |mean AS (
       |  SELECT doc_id, ((sum(bits)::BIGINT * 1000) // count(*))::BIGINT
       |    AS mean_millibits
       |  FROM sc GROUP BY doc_id),
       |t AS (
       |  SELECT m.doc_id, d.lang, m.mean_millibits,
       |    ntile(3) OVER (PARTITION BY d.lang
       |      ORDER BY m.mean_millibits, m.doc_id) AS tc
       |  FROM mean m JOIN documents d ON m.doc_id = d.doc_id)
       |SELECT doc_id, lang, mean_millibits,
       |  CASE tc WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
       |    AS bucket
       |FROM t ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every document by the log-likelihood ratio between a TARGET-domain
    * unigram LM (here: the `lang = 'en'` slice — the domain a curator
    * wants more of) and the RAW-corpus LM. Positive = the target model
    * likes the doc more than the background does; importance resampling
    * then samples ∝ exp(weight). The published method hashes n-gram
    * features into buckets; the integer token codes here ARE that hashed
    * feature space.
    *
    * Same integer-bits quantization as [[textSurprisal]] (libm-free,
    * cross-engine exact): weight(w) = bits_raw(w) − bits_target(w) with
    * bits_x = bitlength(⌊N_x/cnt_x⌋). The target LM is add-one smoothed
    * over the RAW vocabulary (cnt_t+1 over N_t+V — tokens unseen in
    * target stay finite), the raw LM needs none (every stream token has
    * cnt_r ≥ 1). Σ(cnt_t+1) = N_t+V exactly, so ONE aggregation row
    * carries both normalizers. The signed mean uses floor of exact double
    * division on BOTH engines — DuckDB's `//` truncates toward zero on
    * negatives while Spark's floor() floors, so the integer-division
    * idiom the positive-only surprisal queries use would diverge here.
    *
    * Scale shape: token stream → two map-side-combinable counts (raw,
    * target) → vocabulary-bounded LM join back to the stream; the 1-row
    * normalizer frame rides a broadcast. No driver collect.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stream = Tables.documents(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("w"))
      .select($"doc_id", $"lang", tokenCode($"w").as("code"))
      .pin(true) // three consumers: raw LM, target LM, scoring
    val rawLm = stream.groupBy($"code").agg(count(lit(1)).as("cnt_r"))
    val tgtLm = stream.filter($"lang" === "en")
      .groupBy($"code").agg(count(lit(1)).as("cnt_t"))
    val lm = rawLm.join(tgtLm, Seq("code"), "left")
      .select($"code", $"cnt_r",
        (coalesce($"cnt_t", lit(0L)) + 1L).as("cnt_t1"))
      .pin(true) // consumed by the normalizer agg + the scoring join
    val tot = lm.agg(sum($"cnt_r").as("n_r"), sum($"cnt_t1").as("n_t1"))
    stream.join(lm, Seq("code")).crossJoin(broadcast(tot))
      .withColumn("wbits",
        length(bin(floor($"n_r" / $"cnt_r").cast("long"))).cast("long")
          - length(bin(floor($"n_t1" / $"cnt_t1").cast("long"))).cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"wbits").as("dsir_bits"))
      .withColumn("mean_millibits",
        floor(($"dsir_bits" * 1000L) / $"n_tokens").cast("long"))
      .orderBy($"doc_id")
  }

  val dsirWeightsSql: String =
    s"""WITH ts AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |cs AS (SELECT doc_id, lang, $tokenCodeSql AS code FROM ts),
       |rl AS (SELECT code, count(*)::BIGINT AS cnt_r FROM cs GROUP BY code),
       |tl AS (SELECT code, count(*)::BIGINT AS cnt_t FROM cs
       |       WHERE lang = 'en' GROUP BY code),
       |lm AS (SELECT code, cnt_r, coalesce(cnt_t, 0) + 1 AS cnt_t1
       |       FROM rl LEFT JOIN tl USING (code)),
       |tot AS (SELECT sum(cnt_r)::BIGINT AS n_r, sum(cnt_t1)::BIGINT AS n_t1
       |        FROM lm),
       |sc AS (
       |  SELECT doc_id,
       |    length(bin(n_r // cnt_r))::BIGINT
       |      - length(bin(n_t1 // cnt_t1))::BIGINT AS w
       |  FROM cs JOIN lm USING (code) CROSS JOIN tot)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  sum(w)::BIGINT AS dsir_bits,
       |  floor((sum(w)::BIGINT * 1000)::DOUBLE / count(*))::BIGINT
       |    AS mean_millibits
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- content-defined chunking (sub-document dedup) ----

  private val P31: Array[Long] =
    Iterator.iterate(1L)(_ * 31L).take(8).toArray // 31^0 .. 31^7

  /** Content-defined chunking (Rabin/Gear-style, as in LBFS/FastCDC and
    * the chunk-level dedup used for code corpora): split every doc at
    * positions where an 8-char window hash ≡ 0 (mod 64), then measure how
    * much of each doc is chunk-level copy-paste shared with OTHER docs —
    * the sub-document dedup signal whole-doc MinHash can't give (a doc
    * that embeds a copied paragraph inside fresh text). Boundaries depend
    * only on local content, so insertions shift chunk frames without
    * invalidating downstream chunks — the property that makes CDC work
    * where fixed-width blocking fails.
    *
    * Window hash = Σ ascii(c_j)·31^(7-j) over the 8 trailing chars —
    * max < 7.3e12, exact in int64 on both engines; expected chunk ≈ 64
    * chars. The doc end is always a sentinel boundary, so every doc has
    * ≥ 1 chunk and the per-doc ratio is never 0/0.
    *
    * Scale: boundary detection explodes the doc into its character-code
    * stream and computes the window hash with 8 `lag`s over one per-doc
    * window — O(chars) work and one narrow (doc_id, pos, code) shuffle.
    * (The first cut evaluated `substr(text, i, 1)` per position instead:
    * UTF8 position lookup is O(i), which makes that shape O(L²) per doc —
    * measured 12s vs 1s at sf0.1 for ~300-char docs, and the gap grows
    * with document length.) The per-doc window parallelizes across docs,
    * the unit that scales at 100 TB. Chunk assembly is one per-doc lag
    * over the SMALL boundary frame (~len/64 rows per doc, not per char);
    * occurrence counting shuffles on chunk content exactly like exact
    * dedup. The chunk frame is materialized once for its two consumers
    * (occurrence count + scoring join).
    */
  /** Shared CDC chunk frame: (doc_id, st, chunk), st = 1-based start of the
    * chunk inside its doc — consumed by [[cdcChunks]] (occurrence scoring)
    * and [[chunkPrune]] (first-owner pruning, which needs st to order
    * occurrences and to reconstruct the cleaned doc).
    */
  private def cdcChunkFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      .pin(true) // read by positions, the sentinel union, and chunk assembly
    val codes = docs
      .select($"doc_id", posexplode(split($"text", "")))
      .select($"doc_id", ($"pos" + 1).as("i"), ascii($"col").cast("long").as("c"))
    val w = Window.partitionBy($"doc_id").orderBy($"i")
    // h(i) = Σ_k code(i−k)·31^k — the same trailing-8 polynomial as the
    // substr formulation, but each term is an O(1) lag
    val h = (0 to 7).map(k => lag($"c", k).over(w) * lit(P31(k))).reduce(_ + _)
    val bounds = codes.withColumn("h", h)
      .filter($"i" >= 8 && $"h" % 64 === 0)
      .select($"doc_id", $"i".as("b"))
      .unionByName(docs.select($"doc_id", length($"text").as("b")))
      .distinct()
    bounds
      .withColumn("st",
        coalesce(lag($"b", 1).over(
          Window.partitionBy($"doc_id").orderBy($"b")), lit(0)) + 1)
      .join(docs, "doc_id")
      .select($"doc_id", $"st",
        $"text".substr($"st", $"b" - $"st" + 1).as("chunk"))
  }

  def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = cdcChunkFrame(s, dir).pin(true)
    val occ = chunks.groupBy($"chunk")
      .agg(countDistinct($"doc_id").as("ndocs"))
    chunks.join(occ, "chunk")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"ndocs" > 1, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_permille",
        floor($"dup_chunks" * 1000L / $"n_chunks").cast("long"))
      .orderBy($"doc_id")
  }

  /** CTE prefix ending in `ch(doc_id, st, chunk)` — the SQL mirror of
    * [[cdcChunkFrame]], shared by the cdc-chunks and chunk-prune oracles.
    */
  private val cdcChunkCte: String = {
    val h = (0 to 7).map(j =>
      s"ascii(substr(text, i + ${j - 7}, 1))::BIGINT * ${P31(7 - j)}")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       |pos AS (SELECT doc_id, text, i.i AS i
       |        FROM d, LATERAL (SELECT unnest(range(8, length(d.text) + 1)) AS i) i),
       |b0 AS (SELECT doc_id, i AS b FROM pos WHERE ($h) % 64 = 0
       |       UNION SELECT doc_id, length(text) FROM d),
       |bl AS (SELECT doc_id, b,
       |         coalesce(lag(b) OVER (PARTITION BY doc_id ORDER BY b), 0) + 1
       |           AS st
       |       FROM b0),
       |ch AS (SELECT bl.doc_id, bl.st, substr(d.text, st, b - st + 1) AS chunk
       |       FROM bl JOIN d USING (doc_id))
       |""".stripMargin
  }

  val cdcChunksSql: String = cdcChunkCte +
    """, occ AS (SELECT chunk, count(DISTINCT doc_id)::BIGINT AS ndocs
      |        FROM ch GROUP BY chunk)
      |SELECT doc_id, count(*)::BIGINT AS n_chunks,
      |  sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
      |  ((sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) * 1000) // count(*))
      |    ::BIGINT AS dup_permille
      |FROM ch JOIN occ USING (chunk)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Sub-document dedup ACTION: prune every repeated CDC chunk except its
    * global first occurrence (ordered by doc_id, then start offset) and
    * report what each reconstructed document retains — the chunk-level
    * analogue of CCNet's discard-duplicated-paragraphs pass, applied at
    * CDC granularity so shifted copies still collapse. [[cdcChunks]] only
    * SCORES sub-document duplication; this executes the prune: a real
    * pipeline materializes the kept (doc_id, st) set and rebuilds each doc
    * by concatenating its surviving chunks in offset order (clean_chars is
    * exactly that reconstruction's length).
    *
    * Scale: first-owner per chunk content is ONE mergeable agg — the
    * (doc_id, st) pair packed into a single long (st < 2^20 ≤ any doc
    * length here; the pack preserves lexicographic order), so the min stays
    * a codegen'd HashAggregate (a struct-typed min falls back to
    * SortAggregate) — and deliberately NOT a row_number window over a
    * chunk-content partition, which would sort the full occurrence list
    * of every hot boilerplate chunk on one partition (corpus-sized for a
    * universal header). The keep test is then a chunk-keyed join against
    * the 1-row-per-chunk owner frame, and the per-doc rollup shuffles on
    * doc_id. Same chunk frame as [[cdcChunks]], materialized once.
    */
  def chunkPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = cdcChunkFrame(s, dir).pin(true)
    val first = chunks.groupBy($"chunk")
      .agg(min($"doc_id" * 1048576L + $"st").as("f"))
    chunks.join(first, Seq("chunk"))
      .withColumn("kept",
        ($"doc_id" * 1048576L + $"st" === $"f").cast("long"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"kept").as("kept_chunks"),
        sum($"kept" * length($"chunk")).cast("long").as("clean_chars"))
      .withColumn("drop_permille",
        floor(($"n_chunks" - $"kept_chunks") * 1000L / $"n_chunks")
          .cast("long"))
      .orderBy($"doc_id")
  }

  /** Same packed-long first-owner min as the Spark side. */
  val chunkPruneSql: String = cdcChunkCte +
    """, f1 AS (SELECT chunk, min(doc_id * 1048576 + st) AS f
      |       FROM ch GROUP BY chunk),
      |k AS (SELECT c.doc_id, length(c.chunk) AS clen,
      |        CASE WHEN c.doc_id * 1048576 + c.st = f1.f
      |             THEN 1 ELSE 0 END AS kept
      |      FROM ch c JOIN f1 ON c.chunk = f1.chunk)
      |SELECT doc_id, count(*)::BIGINT AS n_chunks,
      |  sum(kept)::BIGINT AS kept_chunks,
      |  sum(kept * clen)::BIGINT AS clean_chars,
      |  (((count(*) - sum(kept)) * 1000) // count(*))::BIGINT AS drop_permille
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- token-budget curation selection ----

  /** Budget-constrained corpus selection — "fill a token budget with the
    * highest-quality documents": rank docs by type-token ratio (the
    * lexical-diversity quality axis Gopher's repetition rules approximate)
    * and keep the best quality BUCKETS whose cumulative token mass fits a
    * budget of total/10 tokens. This is the assembly step after scoring —
    * the decision a 100 TB curation run materializes as its training
    * manifest when the target is "N tokens of the best data", not a fixed
    * quality cutoff.
    *
    * Scale: deliberately NOT a global quality-ordered running sum over the
    * corpus (a no-partition window = one executor sorting 100 TB). Quality
    * is bucketed to permille resolution first, so the cumulative scan runs
    * over a ≤1001-row bucket frame (bounded at ANY corpus size — the only
    * unpartitioned window in the plan is over that frame), and the per-doc
    * keep decision is a broadcast threshold probe. Docs inside the
    * marginal bucket are all-or-nothing (the bucket that would overflow
    * the budget is excluded) — at permille resolution the quantization
    * error is ≤ one bucket's mass, the price of staying scan-shaped.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val stream = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
    val sc = stream.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct($"w").as("n_distinct"))
      .withColumn("ttr",
        floor($"n_distinct" * 1000L / $"n_tokens").cast("long"))
      .pin(true) // read by budget agg, bucket agg, final probe
    val bud = sc.agg(floor(sum($"n_tokens") / 10L).cast("long").as("budget"))
    val cm = sc.groupBy($"ttr").agg(sum($"n_tokens").as("btok"))
      // bounded frame: ≤ 1001 permille buckets regardless of corpus size
      .withColumn("cum", sum($"btok").over(Window.orderBy($"ttr".desc)))
    val th = cm.crossJoin(broadcast(bud)).filter($"cum" <= $"budget")
      .agg(min($"ttr").as("thr"))
    sc.crossJoin(broadcast(th))
      .select($"doc_id", $"n_tokens", $"ttr".as("ttr_permille"),
        when($"ttr" >= $"thr", 1L).otherwise(0L).as("keep"))
      .orderBy($"doc_id")
  }

  val tokenBudgetSql: String =
    """WITH ts AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |sc AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |    (count(DISTINCT w) * 1000 // count(*))::BIGINT AS ttr
      |  FROM ts GROUP BY doc_id),
      |bud AS (SELECT (sum(n_tokens) // 10)::BIGINT AS budget FROM sc),
      |cm AS (SELECT ttr, sum(btok) OVER (ORDER BY ttr DESC) AS cum
      |       FROM (SELECT ttr, sum(n_tokens)::BIGINT AS btok
      |             FROM sc GROUP BY ttr)),
      |th AS (SELECT min(ttr) AS thr FROM cm CROSS JOIN bud
      |       WHERE cum <= budget)
      |SELECT doc_id, n_tokens, ttr AS ttr_permille,
      |  (CASE WHEN ttr >= thr THEN 1 ELSE 0 END)::BIGINT AS keep
      |FROM sc CROSS JOIN th ORDER BY doc_id""".stripMargin

  /** Token budgeting on EFFECTIVE tokens — [[tokenBudget]]'s quality
    * threshold recomputed with every document's mass discounted by its
    * soft-dedup weight ([[softWeights]]: 1/cluster-size in permille), in
    * exact integer MILLI-tokens. The honest form of the budget cut: a
    * corpus full of near-dup families has much less effective data than
    * raw token counts claim, so the raw-budget threshold over-prunes
    * unique text while duplicated text sails through on volume. The
    * threshold found here fits the SAME 10% budget measured in effective
    * mass; the divergence between the two thresholds is itself the
    * duplication signal.
    *
    * Scale: the weight attach is one doc_id-keyed join on the
    * contraction labels; everything else is the tokenBudget shape (one
    * corpus pass, ≤1001-bucket cumulative frame, 1-row threshold).
    */
  def softBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val nodes = Tables.documents(s, dir).select($"doc_id")
    val (labels, _) =
      starContraction(nodes, shinglePairsOf(shingleCodes(s, dir)))
    val weights = labels.groupBy($"label").agg(count(lit(1)).as("nm"))
      .join(labels, Seq("label"))
      .select($"doc_id", floor(lit(1000L) / $"nm").cast("long").as("wpm"))
    val stream = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
    val sc = stream.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct($"w").as("n_distinct"))
      .withColumn("ttr",
        floor($"n_distinct" * 1000L / $"n_tokens").cast("long"))
      .join(weights, Seq("doc_id"))
      .withColumn("eff_mtok", $"n_tokens" * $"wpm")
      .pin(true) // budget agg, bucket agg, final probe
    val bud = sc.agg(floor(sum($"eff_mtok") / 10L).cast("long").as("budget"))
    val cm = sc.groupBy($"ttr").agg(sum($"eff_mtok").as("btok"))
      .withColumn("cum", sum($"btok").over(Window.orderBy($"ttr".desc)))
    val th = cm.crossJoin(broadcast(bud)).filter($"cum" <= $"budget")
      .agg(min($"ttr").as("thr"))
    sc.crossJoin(broadcast(th))
      .select($"doc_id", $"n_tokens", $"wpm".as("weight_permille"),
        $"eff_mtok", $"ttr".as("ttr_permille"),
        when($"ttr" >= $"thr", 1L).otherwise(0L).as("keep"))
      .orderBy($"doc_id")
  }

  lazy val softBudgetSql: String =
    shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") + shingleBandsCte + {
      """,
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach(node, m) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, r.m FROM edges e JOIN reach r ON e.b = r.node),
        |lab AS (SELECT node AS doc_id, min(m)::BIGINT AS cluster
        |        FROM reach GROUP BY node),
        |szc AS (SELECT cluster, count(*)::BIGINT AS nm FROM lab
        |        GROUP BY cluster),
        |wts AS (
        |  SELECT lab.doc_id, (1000 // szc.nm)::BIGINT AS wpm
        |  FROM lab JOIN szc ON lab.cluster = szc.cluster),
        |ts AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |sc AS (
        |  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
        |    (count(DISTINCT t.w) * 1000 // count(*))::BIGINT AS ttr,
        |    min(w2.wpm)::BIGINT AS wpm,
        |    (count(*) * min(w2.wpm))::BIGINT AS eff_mtok
        |  FROM ts t JOIN wts w2 ON t.doc_id = w2.doc_id
        |  GROUP BY t.doc_id),
        |bud AS (SELECT (sum(eff_mtok) // 10)::BIGINT AS budget FROM sc),
        |cm AS (SELECT ttr, sum(btok) OVER (ORDER BY ttr DESC) AS cum
        |       FROM (SELECT ttr, sum(eff_mtok)::BIGINT AS btok
        |             FROM sc GROUP BY ttr) z),
        |th AS (SELECT min(ttr) AS thr FROM cm CROSS JOIN bud
        |       WHERE cum <= budget)
        |SELECT doc_id, n_tokens, wpm AS weight_permille, eff_mtok,
        |  ttr AS ttr_permille,
        |  (CASE WHEN ttr >= thr THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM sc CROSS JOIN th ORDER BY doc_id""".stripMargin
    }

  // ---- RAG chunking ----

  /** Overlapping sliding-window chunking (window 32 tokens, stride 24 — a
    * 25% overlap): the retrieval-side document preparation every
    * RAG/embedding pipeline runs before vectorizing — overlap so no
    * sentence straddles a hard boundary, fixed token windows so chunk
    * embeddings see uniform context length. Emits the chunk MANIFEST
    * (offsets, token/char counts, boundary words), which is what the
    * embedding stage consumes; the chunk text itself is re-sliceable from
    * the offsets without materializing it corpus-wide.
    *
    * Scale: pure per-row Generate work — one `sequence` of chunk starts
    * posexploded per doc, array slicing per chunk, no shuffle at all
    * until the presentation sort. Chunk count per doc is ⌈n/stride⌉,
    * linear in tokens; the operator is scan-shaped at any corpus size.
    */
  def chunkStride(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arr0 = split($"text", " ")
    Tables.documents(s, dir)
      .select($"doc_id", arr0.as("arr"), size(arr0).as("n"))
      .select($"doc_id", $"arr", $"n",
        posexplode(sequence(lit(1), $"n", lit(24))).as(Seq("chunk_idx", "st")))
      .withColumn("n_tokens", least(lit(32), $"n" - $"st" + 1))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        $"st".cast("long").as("st_token"), $"n_tokens".cast("long").as("n_tokens"),
        element_at($"arr", $"st").as("head_w"),
        element_at($"arr", $"st" + $"n_tokens" - 1).as("tail_w"),
        length(array_join(slice($"arr", $"st", lit(32)), " "))
          .cast("long").as("chunk_chars"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val chunkStrideSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS arr,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, arr, n, unnest(range(1, n + 1, 24)) AS st FROM d),
      |ck AS (
      |  SELECT doc_id, ((st - 1) // 24)::BIGINT AS chunk_idx,
      |    st::BIGINT AS st_token,
      |    least(32, n - st + 1)::BIGINT AS n_tokens, arr, st
      |  FROM st)
      |SELECT doc_id, chunk_idx, st_token, n_tokens,
      |  arr[st] AS head_w,
      |  arr[(st + n_tokens - 1)::INT] AS tail_w,
      |  length(array_to_string(arr[st:(st + n_tokens - 1)::INT], ' '))::BIGINT
      |    AS chunk_chars
      |FROM ck ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- BM25 retrieval ----

  /** BM25 top-10 retrieval (Robertson–Spärck Jones; k1 = 1.2, b = 0.75)
    * for a fixed conjunctive term set — the ranking function behind every
    * lexical search / nearest-text service a curation stack runs next to
    * its inverted index ([[invertedIndex]] is the index contract; this is
    * the query-time scorer).
    *
    * Cross-engine exactness: idf is integer-bits (bitlength(⌊N/df⌋), the
    * [[textSurprisal]] idiom), and the tf saturation term is cleared of
    * floats entirely — with k1 = 6/5, b = 3/4 and avgdl = T/N:
    *   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *     = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)
    * so each term's contribution is one exact int64 floor-division
    * (`div`, not double division — the numerator overflows float64's 2^53
    * at corpus scale), summed in millis. Bit-identical in both engines.
    *
    * Scale: the term set rides a broadcast; tf is one mergeable agg over
    * the matching token stream (non-matching tokens are filtered before
    * the shuffle); dl/N/T are corpus constants computed once (1-row
    * broadcast); top-10 is sort+limit = TakeOrdered (k×partitions, no
    * global sort). The only per-doc state is its matched-term rows (≤ 3).
    */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("spark", "query", "window")
    val stream = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .pin(true) // read by dl, totals, and the tf filter
    val dl = stream.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val nt = stream.agg(countDistinct($"doc_id").as("n_docs"),
      count(lit(1)).as("t_tokens"))
    val tf = stream.filter($"w".isin(terms: _*))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(countDistinct($"doc_id").as("df"))
    val scored = tf.join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(nt))
      .withColumn("idf_bits",
        length(bin(floor($"n_docs" / $"df").cast("long"))).cast("long"))
      .withColumn("contrib", expr(
        "(idf_bits * 22 * tf * t_tokens * 1000) div " +
          "(10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
        sum($"contrib").as("score_millis"))
      .orderBy($"score_millis".desc, $"doc_id")
      .limit(10)
    scored.withColumn("rnk", row_number().over(
        Window.orderBy($"score_millis".desc, $"doc_id"))) // 10-row frame
      .orderBy($"rnk")
  }

  val bm25TopKSql: String =
    """WITH ts AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM ts GROUP BY doc_id),
      |nt AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs,
      |              count(*)::BIGINT AS t_tokens FROM ts),
      |tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM ts
      |       WHERE w IN ('spark', 'query', 'window') GROUP BY doc_id, w),
      |df AS (SELECT w, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT tf.doc_id,
      |    (length(bin(n_docs // df))::BIGINT * 22 * tf * t_tokens * 1000)
      |      // (10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs)
      |      AS contrib
      |  FROM tf JOIN df USING (w) JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN nt),
      |top AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_hit_terms,
      |    sum(contrib)::BIGINT AS score_millis
      |  FROM sc GROUP BY doc_id
      |  ORDER BY score_millis DESC, doc_id LIMIT 10)
      |SELECT doc_id, n_hit_terms, score_millis,
      |  row_number() OVER (ORDER BY score_millis DESC, doc_id) AS rnk
      |FROM top ORDER BY rnk""".stripMargin

  /** Zipf rank-frequency audit: the vocabulary ranked by corpus frequency
    * (freq desc, token tie-break), log₂-bucketed by rank (bucket =
    * bitlength(rank) — the same integer-log idiom as [[pplBuckets]] /
    * [[degreeHist]]), with per-bucket token counts and frequency ranges,
    * plus the least-squares slope of bitlength(freq) on bitlength(rank)
    * over ALL vocabulary points as constant columns. Natural text obeys
    * slope ≈ −1 (Zipf's law); a corpus whose slope is far off is
    * template-heavy (flat head) or OCR-noise-heavy (fat tail of hapaxes)
    * — the one-glance corpus-health diagnostic run before tokenizer
    * training (vocab sizing reads exactly this curve).
    *
    * Everything is exact: counts and bitlengths are int64; the regression
    * numerator/denominator n·Σxy − Σx·Σy and n·Σx² − (Σx)² are exact
    * int64 (cross-multiplied, the [[Events]] anomaly-test idiom), and the
    * one division is a single rounded double of identical ints.
    *
    * Scale: one token count (map-side combinable); vocabulary ranks come
    * from the two-pass [[GlobalOrder.rank]] (range-partitioned local
    * ranks + broadcast offsets — the vocabulary is ≪ corpus but still
    * ~10⁷–10⁸ distinct tokens at 100 TB, too wide for a single-reducer
    * global window); then O(vocab) arithmetic. The corpus-sized pass is
    * only the first count.
    */
  /** Per-term BURSTINESS (Church & Gale 1995's deviation-from-Poisson
    * diagnostic, as the variance-to-mean ratio of within-document term
    * frequency over the documents CONTAINING the term): a Poisson term
    * has VMR ≈ 1 whatever its frequency; content words burst — once a
    * document mentions them it mentions them repeatedly — so VMR ≫ 1,
    * while function words sit near 1 at any df. The signal tf·idf and
    * [[bigramSurprisal]] don't expose: it separates topical vocabulary
    * from glue INDEPENDENT of rarity, the feature term-weighting and
    * keyword extraction read to avoid over-crediting merely-rare tokens.
    * Exact integer throughout: over the df docs containing the term,
    * VMR_pm = 1000·(df·Σtf² − (Σtf)²) div (df·Σtf) (population variance
    * over mean, cross-multiplied). df ≥ 50 bounds the output to the
    * established vocabulary; top-20 by VMR. Headroom: df·Σtf² < 2⁶³
    * needs df·tf²_max ≪ 2⁶³/df — int64-safe to ~10⁸ containing docs at
    * tf ≤ 10³; beyond that the fold moves to DECIMAL(38), same as the
    * ANOVA t-sum.
    *
    * Scale: one (doc, term) tf count (map-side combinable) + one
    * term-keyed moment fold — the posting-aggregate shape, never a pair
    * frame; the df filter prunes before the top-k.
    */
  def burstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    tf.groupBy($"w").agg(count(lit(1)).as("df"),
        sum($"tf").as("s1"), sum($"tf" * $"tf").as("s2"))
      .filter($"df" >= 50L)
      .select($"w".as("term"), $"df",
        expr("s1 * 1000 div df").as("mean_tf_pm"),
        expr("(df * s2 - s1 * s1) * 1000 div (df * s1)")
          .as("burstiness_pm"))
      .orderBy($"burstiness_pm".desc, $"term").limit(20)
  }

  val burstinessSql: String =
    """WITH tf AS (
      |  SELECT doc_id, w, count(*)::BIGINT AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents) t
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT w, count(*)::BIGINT AS df, sum(tf)::BIGINT AS s1,
      |    sum(tf * tf)::BIGINT AS s2
      |  FROM tf GROUP BY w)
      |SELECT w AS term, df, (s1 * 1000 // df)::BIGINT AS mean_tf_pm,
      |  ((df * s2 - s1 * s1) * 1000 // (df * s1))::BIGINT AS burstiness_pm
      |FROM st WHERE df >= 50
      |ORDER BY burstiness_pm DESC, term LIMIT 20""".stripMargin

  def zipfCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freq = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
    val (rankedRaw, _) =
      GlobalOrder.rank(freq, Seq($"f".desc, $"w"), "rnk")
    val ranked = rankedRaw
      .withColumn("x", length(bin($"rnk")).cast("long"))
      .withColumn("y", length(bin($"f")).cast("long"))
      .pin(true) // bucket agg + regression agg
    val slope = ranked.agg(
        count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select(
        ($"n" * $"sxy" - $"sx" * $"sy").as("slope_num"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("slope_den"))
      .withColumn("slope",
        round($"slope_num".cast("double") / $"slope_den", 3))
    ranked.groupBy($"x".as("bucket"))
      .agg(count(lit(1)).as("n_tokens"), max($"f").as("max_freq"),
        min($"f").as("min_freq"), sum($"f").as("occ"))
      .crossJoin(broadcast(slope))
      .orderBy($"bucket")
  }

  val zipfCurveSql: String =
    """WITH tokall AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |freq AS (SELECT w, count(*)::BIGINT AS f FROM tokall GROUP BY w),
      |ranked AS MATERIALIZED (
      |  SELECT f, length(bin(row_number() OVER (ORDER BY f DESC, w)))::BIGINT
      |      AS x,
      |    length(bin(f))::BIGINT AS y
      |  FROM freq),
      |slope AS (
      |  SELECT (count(*) * sum(x * y) - sum(x) * sum(y))::BIGINT AS slope_num,
      |    (count(*) * sum(x * x) - sum(x) * sum(x))::BIGINT AS slope_den
      |  FROM ranked)
      |SELECT x AS bucket, count(*)::BIGINT AS n_tokens,
      |  max(f)::BIGINT AS max_freq, min(f)::BIGINT AS min_freq,
      |  sum(f)::BIGINT AS occ, slope_num, slope_den,
      |  round(slope_num * 1.0 / slope_den, 3) AS slope
      |FROM ranked CROSS JOIN slope
      |GROUP BY x, slope_num, slope_den ORDER BY bucket""".stripMargin

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases are
    * the maximal token runs between delimiter words (the corpus'
    * function words 'a'/'the' — the stopword-split that defines RAKE),
    * words are scored degree/frequency (degree = Σ phrase length over
    * phrases containing the word), and a phrase scores the sum of its
    * words' scores. The division is integer millis (Σdeg·1000 div Σfreq
    * — floor-div of positive int64s, identical in both engines), so the
    * ranking needs no float. Phrases capped at length 2–4 (RAKE
    * practice; length-1 "phrases" are just unigram frequency). Top-20 by
    * score, phrase-text tie-break.
    *
    * Scale: segmentation is the gaps-and-islands idiom — one running
    * delimiter count per doc-window over the posexploded token stream
    * (O(tokens), never a positional self-join); word stats and phrase
    * assembly are (w)- and (doc, seg)-keyed mergeable aggs. The phrase
    * dictionary the final ranking sees is vocabulary-of-phrases-sized,
    * not corpus-sized.
    */
  def rakePhrases(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dw = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("is_delim",
        ($"w" === "a" || $"w" === "the").cast("int"))
    val pw = toks
      .withColumn("seg", sum($"is_delim").over(dw))
      .filter($"is_delim" === 0)
      .select($"doc_id", $"seg", $"pos", $"w")
      .pin(true) // word stats + phrase lengths + assembly
    val plen = pw.groupBy($"doc_id", $"seg").agg(count(lit(1)).as("plen"))
    val wstat = pw.join(plen, Seq("doc_id", "seg"))
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("deg"))
    val phr = pw.join(wstat, Seq("w"))
      .groupBy($"doc_id", $"seg")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct($"pos", $"w"))),
          x => x.getField("w")), " ").as("phrase"),
        sum($"deg").as("pdeg"), sum($"freq").as("pfreq"),
        count(lit(1)).as("np"))
      .filter($"np".between(2, 4))
    val scored = phr.groupBy($"phrase")
      .agg(count(lit(1)).as("n_occ"),
        expr("max(pdeg) * 1000 div max(pfreq)").as("score_milli"))
    scored.orderBy($"score_milli".desc, $"phrase").limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy($"score_milli".desc, $"phrase"))) // 20-row frame
      .orderBy($"rnk")
  }

  val rakePhrasesSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |marked AS (
      |  SELECT doc_id, pos, w,
      |    (CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END) AS is_delim,
      |    sum(CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      |  FROM tok),
      |pw AS MATERIALIZED (
      |  SELECT doc_id, seg, pos, w FROM marked WHERE is_delim = 0),
      |plen AS (SELECT doc_id, seg, count(*)::BIGINT AS plen
      |         FROM pw GROUP BY doc_id, seg),
      |wstat AS (
      |  SELECT pw.w, count(*)::BIGINT AS freq, sum(plen.plen)::BIGINT AS deg
      |  FROM pw JOIN plen ON pw.doc_id = plen.doc_id AND pw.seg = plen.seg
      |  GROUP BY pw.w),
      |phr AS (
      |  SELECT pw.doc_id, pw.seg,
      |    string_agg(pw.w, ' ' ORDER BY pw.pos) AS phrase,
      |    sum(ws.deg)::BIGINT AS pdeg, sum(ws.freq)::BIGINT AS pfreq
      |  FROM pw JOIN wstat ws ON pw.w = ws.w
      |  GROUP BY pw.doc_id, pw.seg
      |  HAVING count(*) BETWEEN 2 AND 4),
      |scored AS (
      |  SELECT phrase, count(*)::BIGINT AS n_occ,
      |    (max(pdeg) * 1000 // max(pfreq))::BIGINT AS score_milli
      |  FROM phr GROUP BY phrase),
      |top AS (SELECT * FROM scored
      |        ORDER BY score_milli DESC, phrase LIMIT 20)
      |SELECT phrase, n_occ, score_milli,
      |  row_number() OVER (ORDER BY score_milli DESC, phrase) AS rnk
      |FROM top ORDER BY rnk""".stripMargin

  /** Edit-distance VERIFICATION of near-dup candidates: exact Levenshtein
    * over the leading 120 characters of each GROUP-representative
    * candidate pair ([[groupPairsOf]]), keeping pairs within distance 78
    * — the "character-level rerank" a dedup pipeline runs after banding
    * when token-set similarity is not enough (templated spam with word
    * substitutions passes Jaccard but fails edit distance; OCR variants
    * fail Jaccard but pass edit distance). Spark's `levenshtein` and
    * DuckDB's are the same classic DP, so distances are integer-exact
    * cross-engine.
    *
    * Scale — BOTH blow-up axes are bounded: pairs come from the
    * signature-group CONTRACTED graph (the round-9 triangles lesson: the
    * doc-level candidate set is clique-structured — 4.36M pairs at sf0.1
    * vs 12k group edges — and each clique needs ONE representative
    * verification, not C(n,2)); the per-pair DP cost is capped by the
    * 120-char prefix (O(P²), P fixed — full-document edit distance is
    * inherently quadratic in doc length, so production verifies a
    * bounded prefix / fingerprint and only escalates survivors). Prefixes
    * are truncated BEFORE the join, so the shuffle carries 120 bytes per
    * side, not documents.
    */
  def editPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prefix = Tables.documents(s, dir)
      .select($"doc_id", substring($"text", 1, 120).as("t"))
    val pairs = groupPairsOf(s, dir)
    pairs
      .join(prefix.select($"doc_id".as("a"), $"t".as("ta")), Seq("a"))
      .join(prefix.select($"doc_id".as("b"), $"t".as("tb")), Seq("b"))
      .select($"a", $"b", levenshtein($"ta", $"tb").cast("long").as("edit_dist"))
      .filter($"edit_dist" <= 78)
      .orderBy($"a", $"b")
  }

  val editPairsSql: String = groupGraphCte +
    """,
      |pref AS (SELECT doc_id, substr(text, 1, 120) AS t FROM documents),
      |lev AS (
      |  SELECT p.a, p.b, levenshtein(pa.t, pb.t)::BIGINT AS edit_dist
      |  FROM gp p JOIN pref pa ON p.a = pa.doc_id
      |            JOIN pref pb ON p.b = pb.doc_id)
      |SELECT a, b, edit_dist FROM lev
      |WHERE edit_dist <= 78 ORDER BY a, b""".stripMargin

  // ---- exact AUC via rank-sum (Mann–Whitney U) ----

  /** Exact ROC-AUC of an integer classifier score, computed as the
    * Mann–Whitney rank-sum WITHOUT per-row ranking: group rows by score
    * (one map-side-combinable aggregation), then fold the SCORE
    * DISTRIBUTION — a frame bounded by the score domain, never the
    * corpus — with a cumulative count of negatives below each score.
    * U counts (pos, neg) pairs where the positive outscores the negative,
    * ties at half; everything is kept ×2 so the statistic `u2 = 2·U =
    * Σ_s pos_s·(2·negBelow_s + neg_s)` is exact int64, and
    * `auc_pm = ⌊1000·u2 / (2·n_pos·n_neg)⌋` is an exact permille — both
    * engines hash-identical (the same evaluation on 10¹¹ docs shuffles
    * only the ≤1001-row score histogram after the first aggregation).
    *
    * Demo scoring: label = (lang = 'en'), score = n_chars capped at 1000
    * (the cap is what keeps the score-distribution frame ≤ 1001 rows at
    * ANY corpus size — the same bound class as the ttr-cumsum budget
    * queries; a production caller plugs any integer score in). AUC ≈ 0.5
    * expected on the synthetic corpus — the gate checks the machinery,
    * not the classifier.
    */
  def aucRankSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byScore = Tables.documents(s, dir)
      .select(($"lang" === "en").cast("long").as("y"),
        least($"n_chars", lit(1000L)).as("score"))
      .groupBy($"score")
      .agg(sum($"y").as("pos"), (count(lit(1)) - sum($"y")).as("neg"))
    // ≤1001-row score-distribution frame: the global window is bounded
    // by the score domain (PlanGuardSpec whitelist, ttr-cumsum class)
    val w = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("nb", coalesce(sum($"neg").over(w), lit(0L)))
      .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * (lit(2L) * $"nb" + $"neg")).as("u2"))
      .select($"n_pos", $"n_neg", $"u2",
        expr("(1000 * u2) div (2 * n_pos * n_neg)").as("auc_pm"))
  }

  val aucRankSumSql: String =
    """WITH s AS (
      |  SELECT (lang = 'en')::BIGINT AS y,
      |    least(n_chars, 1000) AS score
      |  FROM documents),
      |b AS (SELECT score, sum(y) AS pos, count(*) - sum(y) AS neg
      |      FROM s GROUP BY score),
      |c AS (SELECT score, pos, neg,
      |        coalesce(sum(neg) OVER (ORDER BY score
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
      |      FROM b)
      |SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
      |  sum(pos * (2 * nb + neg))::BIGINT AS u2,
      |  ((1000 * sum(pos * (2 * nb + neg)))
      |    // (2 * sum(pos) * sum(neg)))::BIGINT AS auc_pm
      |FROM c""".stripMargin

  /** Precision/recall curve over every distinct threshold of the same
    * capped integer score ([[aucRankSum]]'s histogram): predict positive
    * when score ≥ t, so TP/FP at t are top-down cumulative sums over the
    * ≤1001-row score histogram — the whole sweep costs one aggregation
    * plus a bounded-frame fold, independent of corpus size. Permille
    * precision/recall in exact integer floor-division.
    */
  def prCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byScore = Tables.documents(s, dir)
      .select(($"lang" === "en").cast("long").as("y"),
        least($"n_chars", lit(1000L)).as("score"))
      .groupBy($"score")
      .agg(sum($"y").as("pos"), (count(lit(1)) - sum($"y")).as("neg"))
    // ≤1001-row histogram, folded top-down (PlanGuard whitelist class)
    val w = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byScore
      .withColumn("tp", sum($"pos").over(w))
      .withColumn("fp", sum($"neg").over(w))
      .withColumn("np", sum($"pos").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select($"score".as("threshold"), $"tp", $"fp",
        expr("(1000 * tp) div (tp + fp)").as("precision_pm"),
        expr("(1000 * tp) div np").as("recall_pm"))
      .orderBy($"threshold")
  }

  val prCurveSql: String =
    """WITH s AS (
      |  SELECT (lang = 'en')::BIGINT AS y,
      |    least(n_chars, 1000) AS score
      |  FROM documents),
      |b AS (SELECT score, sum(y) AS pos, count(*) - sum(y) AS neg
      |      FROM s GROUP BY score),
      |c AS (SELECT score, pos, neg,
      |        sum(pos) OVER (ORDER BY score DESC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |        sum(neg) OVER (ORDER BY score DESC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
      |        sum(pos) OVER () AS np
      |      FROM b)
      |SELECT score AS threshold, tp::BIGINT AS tp, fp::BIGINT AS fp,
      |  ((1000 * tp) // (tp + fp))::BIGINT AS precision_pm,
      |  ((1000 * tp) // np)::BIGINT AS recall_pm
      |FROM c ORDER BY threshold""".stripMargin

  /** Reliability diagram (calibration curve) of the same demo
    * classifier: treating the capped score as a permille confidence,
    * rows bucket into 10 confidence deciles and each bucket reports its
    * exact mean stated confidence vs its empirical positive rate — the
    * read that tells you whether a quality/toxicity filter's scores MEAN
    * anything before you threshold them (Guo et al., "On Calibration of
    * Modern Neural Networks", ICML 2017). One corpus aggregation to a
    * ≤10-row bucket frame; all arithmetic exact integer permille
    * (floor-division composition is part of the definition, identical in
    * both engines). No window, no cross join — nothing here grows with
    * the corpus.
    */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(($"lang" === "en").cast("long").as("y"),
        least($"n_chars", lit(1000L)).as("score"))
      .select($"y", $"score",
        least(expr("score div 100"), lit(9L)).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), sum($"score").as("sc"),
        sum($"y").as("pos"))
      .select($"bucket", $"n",
        expr("sc div n").as("conf_pm"),
        expr("(1000 * pos) div n").as("acc_pm"))
      .withColumn("gap_pm", abs($"conf_pm" - $"acc_pm"))
      .drop("sc", "pos")
      .orderBy($"bucket")
  }

  private val calibrationCte: String =
    """WITH s AS (
      |  SELECT (lang = 'en')::BIGINT AS y,
      |    least(n_chars, 1000)::BIGINT AS score
      |  FROM documents),
      |b AS (
      |  SELECT least(score // 100, 9) AS bucket,
      |    count(*)::BIGINT AS n, sum(score)::BIGINT AS sc,
      |    sum(y)::BIGINT AS pos
      |  FROM s GROUP BY 1),
      |r AS (
      |  SELECT bucket, n, (sc // n)::BIGINT AS conf_pm,
      |    ((1000 * pos) // n)::BIGINT AS acc_pm
      |  FROM b)
      |""".stripMargin

  val calibrationSql: String = calibrationCte +
    """SELECT bucket, n, conf_pm, acc_pm,
      |  abs(conf_pm - acc_pm)::BIGINT AS gap_pm
      |FROM r ORDER BY bucket""".stripMargin

  /** Expected calibration error: the bucket-mass-weighted mean of the
    * [[calibration]] gaps, in exact integer permille — the one-number
    * summary (ECE) of the reliability diagram. Folds the ≤10-row bucket
    * frame; corpus cost identical to [[calibration]].
    */
  def ece(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    calibration(s, dir)
      .agg(sum($"n").as("n"), count(lit(1)).as("n_buckets"),
        sum($"n" * $"gap_pm").as("wgap"))
      .select($"n", $"n_buckets", expr("wgap div n").as("ece_pm"))
  }

  val eceSql: String = calibrationCte +
    """SELECT sum(n)::BIGINT AS n, count(*)::BIGINT AS n_buckets,
      |  ((sum(n * abs(conf_pm - acc_pm))) // sum(n))::BIGINT AS ece_pm
      |FROM r""".stripMargin

  /** Heaps'-law vocabulary-growth curve (Heaps 1978; the dual of the
    * [[zipfCurve]] rank-frequency audit): cumulative distinct-token
    * count vs cumulative token count at log-spaced corpus prefixes —
    * the read that sizes a tokenizer vocabulary and detects a crawl
    * that stopped discovering new text. Checkpoints are doc-id bit
    * lengths (⌊log2⌋+1 — N-independent, ≤64 buckets at ANY corpus
    * size, and monotone in doc_id so `min(bucket)` ≡ bucket of first
    * occurrence). One content-keyed min-aggregation (the exact-dedup
    * shuffle shape) + one per-bucket count; the cumsum folds a ≤64-row
    * frame (PlanGuardSpec whitelist class). Rate in exact permille.
    */
  def heapsCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(length(bin($"doc_id" + 1)).cast("long").as("b"),
        explode(split($"text", " ")).as("w"))
    val tokCounts = toks.groupBy($"b").agg(count(lit(1)).as("n_toks"))
    val firstB = toks.groupBy($"w").agg(min($"b").as("b"))
      .groupBy($"b").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, 0)
    tokCounts.join(firstB, Seq("b"), "left")
      .withColumn("cum_tokens", sum($"n_toks").over(w))
      .withColumn("cum_vocab", sum(coalesce($"n_new", lit(0L))).over(w))
      .select($"b".as("bucket"), $"cum_tokens", $"cum_vocab",
        expr("(1000 * cum_vocab) div cum_tokens").as("vocab_pm"))
      .orderBy($"bucket")
  }

  val heapsCurveSql: String =
    """WITH toks AS (
      |  SELECT length(bin(doc_id + 1))::BIGINT AS b,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tc AS (SELECT b, count(*) AS n_toks FROM toks GROUP BY b),
      |fb AS (SELECT b, count(*) AS n_new FROM (
      |         SELECT w, min(b) AS b FROM toks GROUP BY w) GROUP BY b),
      |c AS (SELECT tc.b, tc.n_toks, coalesce(fb.n_new, 0) AS n_new
      |      FROM tc LEFT JOIN fb ON tc.b = fb.b)
      |SELECT b AS bucket,
      |  sum(n_toks) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |    AS cum_tokens,
      |  sum(n_new) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
      |    AS cum_vocab,
      |  ((1000 * sum(n_new) OVER (ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |    // sum(n_toks) OVER (ORDER BY b
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
      |    AS vocab_pm
      |FROM c ORDER BY bucket""".stripMargin

  /** The four PII matcher families (ASCII `\d`/`\b` semantics are
    * identical in java.util.regex and RE2, so the same pattern string
    * drives Spark and the DuckDB oracle). Category patterns are
    * mutually non-overlapping by construction: phone (3-3-4) and
    * SSN (3-2-4) dash shapes cannot match each other's text, IPv4
    * needs three dots, email needs `@`.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** Redact all four PII families from a text column, in a fixed
    * category order. Pure per-row codegen'd `regexp_replace` chain —
    * no shuffle, no UDF; the form that runs at any corpus size.
    */
  def piiRedact(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (cat, pat)) =>
      regexp_replace(acc, pat, s"<${cat.toUpperCase}>")
    }

  /** PII detection + redaction audit (the scrub every training-data
    * pipeline runs before tokenization; matcher families follow the
    * public presidio/CommonCrawl-style regex approach): per-document
    * counts for email / US-phone / IPv4 / SSN shapes plus the length
    * and md5 of the redacted text. The synthetic corpus carries no
    * PII, so the gate derives deterministic contact strings from
    * doc_id (interleaved modulos, so docs carry 0–4 categories) —
    * this exercises real matcher/masker parity on both engines; the
    * detection and idempotence laws on adversarial text live in
    * PiiScrubSpec. Embarrassingly parallel (per-row regex, one
    * presentation-only sort).
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = Tables.documents(s, dir).select($"doc_id", concat(
      $"text",
      when($"doc_id" % 2 === 0,
        concat(lit(" u"), $"doc_id", lit("@ex"), $"doc_id" % 10,
          lit(".com"))).otherwise(lit("")),
      when($"doc_id" % 3 === 0,
        concat(lit(" 415-"), lit(100) + $"doc_id" % 900, lit("-"),
          lit(1000) + $"doc_id" % 9000)).otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" 10."), $"doc_id" % 256, lit("."),
          ($"doc_id" * 3) % 256, lit("."),
          ($"doc_id" * 7) % 256)).otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        concat(lit(" "), lit(100) + ($"doc_id" * 3) % 900, lit("-"),
          lit(10) + $"doc_id" % 90, lit("-"),
          lit(1000) + ($"doc_id" * 7) % 9000)).otherwise(lit("")))
      .as("aug"))
    val counted = piiPatterns.foldLeft(aug) { case (df, (cat, pat)) =>
      df.withColumn(s"n_$cat",
        size(regexp_extract_all(col("aug"), lit(pat), lit(0)))
          .cast("long"))
    }
    counted
      .withColumn("red", piiRedact($"aug"))
      .select($"doc_id", $"n_email", $"n_phone", $"n_ip", $"n_ssn",
        ($"n_email" + $"n_phone" + $"n_ip" + $"n_ssn").as("pii_total"),
        length($"red").cast("long").as("red_len"),
        md5($"red").as("red_md5"))
      .orderBy($"doc_id")
  }

  val piiScrubSql: String = {
    val Seq(email, phone, ip, ssn) = piiPatterns.map(_._2)
    s"""WITH aug AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 2 = 0 THEN ' u' || doc_id || '@ex'
      |         || doc_id % 10 || '.com' ELSE '' END
      |    || CASE WHEN doc_id % 3 = 0 THEN ' 415-' || (100 + doc_id % 900)
      |         || '-' || (1000 + doc_id % 9000) ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN ' 10.' || doc_id % 256 || '.'
      |         || (doc_id * 3) % 256 || '.' || (doc_id * 7) % 256
      |         ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ' ' || (100 + (doc_id * 3) % 900)
      |         || '-' || (10 + doc_id % 90) || '-'
      |         || (1000 + (doc_id * 7) % 9000) ELSE '' END AS aug
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(aug, '$email'))::BIGINT AS n_email,
      |    len(regexp_extract_all(aug, '$phone'))::BIGINT AS n_phone,
      |    len(regexp_extract_all(aug, '$ip'))::BIGINT AS n_ip,
      |    len(regexp_extract_all(aug, '$ssn'))::BIGINT AS n_ssn,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      aug, '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'),
      |      '$ip', '<IP>', 'g'), '$ssn', '<SSN>', 'g') AS red
      |  FROM aug)
      |SELECT doc_id, n_email, n_phone, n_ip, n_ssn,
      |  (n_email + n_phone + n_ip + n_ssn)::BIGINT AS pii_total,
      |  len(red)::BIGINT AS red_len, md5(red) AS red_md5
      |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Luhn (mod-10) checksum validity of a card-number candidate that is
    * exactly 16 digits: from the RIGHT, every second digit doubles (with
    * 9 subtracted when the double exceeds 9) and the total must divide
    * by 10. With a fixed length of 16 the from-the-right parity reduces
    * to doubling the EVEN 0-based positions. Pure codegen'd array
    * expression (regexp digits → indexed transform → aggregate) — no
    * UDF, no shuffle.
    */
  def luhnValid(cand: Column): Column = {
    val digits = regexp_extract_all(cand, lit("\\d"), lit(0))
    val summed = aggregate(
      transform(digits, (d, i) => {
        val v = d.cast("int")
        when(i % 2 === 0,
          when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
      }),
      lit(0), (acc, x) => acc + x)
    summed % 10 === 0
  }

  /** SSA issuance-format validity of an `AAA-GG-SSSS` candidate: area
    * not 000/666 and below 900 (900+ is the ITIN range), group not 00,
    * serial not 0000 — the published rules that reject the most common
    * regex false positives (form placeholders, phone fragments).
    */
  def ssnValid(cand: Column): Column = {
    val area = substring(cand, 1, 3).cast("int")
    val grp = substring(cand, 5, 2).cast("int")
    val ser = substring(cand, 8, 4).cast("int")
    area =!= 0 && area =!= 666 && area < 900 && grp =!= 0 && ser =!= 0
  }

  /** NANP validity of an `NXX-NXX-XXXX` candidate: area code and central
    * office code must each start 2–9 (leading 0/1 are routing prefixes,
    * never assignable numbers).
    */
  def nanpValid(cand: Column): Column =
    substring(cand, 1, 1).between("2", "9") &&
      substring(cand, 5, 1).between("2", "9")

  /** Checksum/format VALIDATION over regex PII detection (the pass
    * VERDICT r12 flagged as missing from [[piiScrub]]): regex-only
    * matching carries an unmeasured false-positive rate at corpus scale,
    * so each candidate family is re-checked the way presidio's validators
    * do — Luhn mod-10 for 16-digit card shapes, SSA issuance rules for
    * SSN shapes, NANP prefix rules for phone shapes — and the output
    * reports validated-vs-raw counts per family, i.e. exactly the
    * false-positive measurement. Candidates are derived from doc_id by
    * fixed multiplicative hashes, so every validator sees a natural mix
    * of passing and failing shapes (validity is decided by the CHECK,
    * not planted); known true/false positives (the 4111-1111 Visa test
    * number et al.) live in PiiValidateSpec.
    *
    * Scale: per-row regex extraction + per-candidate arithmetic — one
    * narrow codegen stage over the corpus, then a 3-row global fold.
    * No shuffle beyond the final ≤3-row aggregation.
    */
  def piiValidate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val aug = Tables.documents(s, dir).select($"doc_id", concat(
        $"text", lit(" "),
        lpad((($"doc_id" * 2654435761L + 12345L) % 10000000000000000L)
          .cast("string"), 16, "0"),
        lit(" "),
        lpad(($"doc_id" * 13 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad(($"doc_id" * 7 % 100).cast("string"), 2, "0"), lit("-"),
        lpad(($"doc_id" * 31 % 10000).cast("string"), 4, "0"),
        lit(" "),
        lpad(($"doc_id" * 3 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad(($"doc_id" * 11 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad(($"doc_id" * 17 % 10000).cast("string"), 4, "0"))
      .as("aug"))
    def fam(name: String, pat: String,
        valid: Column => Column): DataFrame =
      aug.select(explode(
          regexp_extract_all($"aug", lit(pat), lit(0))).as("cand"))
        .agg(count(lit(1)).as("raw_n"),
          sum(when(valid($"cand"), 1L).otherwise(0L)).as("valid_n"))
        .select(lit(name).as("family"), $"raw_n", $"valid_n")
    fam("card", "\\b\\d{16}\\b", luhnValid)
      .unionByName(fam("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", nanpValid))
      .unionByName(fam("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", ssnValid))
      .orderBy($"family")
  }

  val piiValidateSql: String =
    """WITH aug AS (
      |  SELECT doc_id, text
      |    || ' ' || lpad(((doc_id * 2654435761 + 12345)
      |         % 10000000000000000)::VARCHAR, 16, '0')
      |    || ' ' || lpad((doc_id * 13 % 1000)::VARCHAR, 3, '0') || '-'
      |         || lpad((doc_id * 7 % 100)::VARCHAR, 2, '0') || '-'
      |         || lpad((doc_id * 31 % 10000)::VARCHAR, 4, '0')
      |    || ' ' || lpad((doc_id * 3 % 1000)::VARCHAR, 3, '0') || '-'
      |         || lpad((doc_id * 11 % 1000)::VARCHAR, 3, '0') || '-'
      |         || lpad((doc_id * 17 % 10000)::VARCHAR, 4, '0') AS aug
      |  FROM documents),
      |cards AS (
      |  SELECT unnest(regexp_extract_all(aug, '\b\d{16}\b')) AS cand
      |  FROM aug),
      |cardv AS (
      |  SELECT list_sum(list_transform(range(16), i -> CASE
      |      WHEN i % 2 = 0 THEN CASE
      |        WHEN 2 * substr(cand, (i + 1)::INT, 1)::INT > 9
      |        THEN 2 * substr(cand, (i + 1)::INT, 1)::INT - 9
      |        ELSE 2 * substr(cand, (i + 1)::INT, 1)::INT END
      |      ELSE substr(cand, (i + 1)::INT, 1)::INT END)) % 10 = 0
      |    AS valid
      |  FROM cards),
      |phones AS (
      |  SELECT unnest(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b'))
      |    AS cand FROM aug),
      |phonev AS (
      |  SELECT substr(cand, 1, 1) BETWEEN '2' AND '9'
      |     AND substr(cand, 5, 1) BETWEEN '2' AND '9' AS valid
      |  FROM phones),
      |ssns AS (
      |  SELECT unnest(regexp_extract_all(aug, '\b\d{3}-\d{2}-\d{4}\b'))
      |    AS cand FROM aug),
      |ssnv AS (
      |  SELECT substr(cand, 1, 3)::INT NOT IN (0, 666)
      |     AND substr(cand, 1, 3)::INT < 900
      |     AND substr(cand, 5, 2)::INT <> 0
      |     AND substr(cand, 8, 4)::INT <> 0 AS valid
      |  FROM ssns)
      |SELECT family, raw_n, valid_n FROM (
      |  SELECT 'card' AS family, count(*)::BIGINT AS raw_n,
      |    sum(CASE WHEN valid THEN 1 ELSE 0 END)::BIGINT AS valid_n
      |  FROM cardv
      |  UNION ALL
      |  SELECT 'phone', count(*)::BIGINT,
      |    sum(CASE WHEN valid THEN 1 ELSE 0 END)::BIGINT FROM phonev
      |  UNION ALL
      |  SELECT 'ssn', count(*)::BIGINT,
      |    sum(CASE WHEN valid THEN 1 ELSE 0 END)::BIGINT FROM ssnv)
      |ORDER BY family""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> piiScrub _,
    "text_pii_validate" -> piiValidate _,
    "text_heaps_curve" -> heapsCurve _,
    "eval_pr_curve" -> prCurve _,
    "eval_calibration" -> calibration _,
    "eval_ece" -> ece _,
    "eval_auc_ranksum" -> aucRankSum _,
    "eval_poisson_bootstrap" -> poissonBootstrap _,
    "dedup_edit_pairs" -> editPairs _,
    "text_stats" -> textStats _,
    "text_surprisal" -> textSurprisal _,
    "text_dsir_weights" -> dsirWeights _,
    "text_ppl_buckets" -> pplBuckets _,
    "text_langid_confusion" -> langIdConfusion _,
    "eval_cohens_kappa" -> cohensKappa _,
    "eval_mcnemar" -> mcnemar _,
    "graph_katz" -> ((s: SparkSession, dir: String) => katzGroups(s, dir)),
    "text_lsa_power" -> ((s: SparkSession, dir: String) => lsaPower(s, dir)),
    "text_lang_nb" -> langNb _,
    "graph_degree_hist" -> degreeHist _,
    "graph_kcore" -> ((s: SparkSession, dir: String) => kcore(s, dir)),
    "text_zipf_curve" -> zipfCurve _,
    "text_burstiness" -> burstiness _,
    "eval_macro_f1" -> evalMacroF1 _,
    "eval_rouge_n" -> evalRougeN _,
    "eval_bradley_terry" -> evalBradleyTerry _,
    "text_rake_phrases" -> rakePhrases _,
    "pipeline_keep_manifest" -> keepManifest _,
    "pipeline_stage_funnel" -> stageFunnel _,
    "text_bigram_surprisal" -> bigramSurprisal _,
    "text_decontaminate" -> decontaminate _,
    "text_ngram_topk" -> ngramTopK _,
    "text_tfidf_terms" -> tfidfTopTerms _,
    "text_pack_sequences" -> packSequences _,
    "text_pack_fragmentation" -> packFragmentation _,
    "text_lang_id" -> langId _,
    "text_fingerprint" -> fingerprint _,
    "text_quality" -> quality _,
    "text_repetition" -> repetition _,
    "text_gopher_rules" -> gopherRules _,
    "text_bpe_train" -> ((s: SparkSession, dir: String) => bpeTrain(s, dir)),
    // the pair-cache production-regime trainer, gated against the SAME
    // oracle as the replace-form chain (identical output contract)
    "text_bpe_train_incremental" ->
      ((s: SparkSession, dir: String) => bpeTrainIncremental(s, dir)),
    "text_bpe_encode" -> bpeEncode _,
    "graph_pagerank" -> ((s: SparkSession, dir: String) => pageRank(s, dir)),
    "graph_pagerank_groups" ->
      ((s: SparkSession, dir: String) => pageRankGroups(s, dir)),
    "text_textrank_terms" ->
      ((s: SparkSession, dir: String) => textRankTerms(s, dir)),
    "graph_resource_alloc" -> resourceAlloc _,
    "text_winnowing" -> winnowingMatches _,
    "graph_ppr" -> ((s: SparkSession, dir: String) => pprRank(s, dir)),
    "graph_ppr_groups" ->
      ((s: SparkSession, dir: String) => pprRankGroups(s, dir)),
    "text_inverted_index" -> invertedIndex _,
    "graph_triangles" -> triangles _,
    "graph_truss" -> ((s: SparkSession, dir: String) => truss(s, dir)),
    "graph_clustering_coeff" -> clusteringCoeff _,
    "graph_component_sizes" -> componentSizes _,
    "graph_diameter_probe" -> diameterProbe _,
    "graph_assortativity" -> assortativity _,
    "sample_leakage_split" -> leakageSafeSplit _,
    "sample_group_kfold" -> ((s: SparkSession, dir: String) => groupKfold(s, dir)),
    "dedup_lsh_tuning" -> lshTuning _,
    "dedup_cluster_purity" -> clusterPurity _,
    "sample_soft_budget" -> softBudget _,
    "dedup_bbit_pairs" -> bbitPairs _,
    "text_corpus_profile" -> corpusProfile _,
    "text_langid_margin" -> langIdMargin _,
    "text_ngram_novelty" -> ngramNovelty _,
    "dedup_exact" -> dedupExact _,
    "dedup_cdc_chunks" -> cdcChunks _,
    "dedup_minhash" -> minhash _,
    "dedup_minhash_pairs" -> minhashPairs _,
    "dedup_shingle_minhash" -> shingleMinhash _,
    "dedup_shingle_pairs" -> shinglePairs _,
    "dedup_ngram_overlap" -> ngramOverlapPairs _,
    "text_dup_spans" -> dupSpanStats _,
    "text_dup_span_cuts" -> dupSpanCuts _,
    "text_dup_span_apply" -> dupSpanApply _,
    "dedup_jaccard_pairs" -> jaccardPairs _,
    "dedup_prefix_pairs" -> prefixPairs _,
    "dedup_recall_audit" -> recallAudit _,
    "dedup_recall_audit_sampled" -> ((s: SparkSession, dir: String) => recallAuditSampled(s, dir)),
    "dedup_sorted_neighborhood" -> sortedNeighborhood _,
    "dedup_single_linkage" -> ((s: SparkSession, dir: String) => singleLinkage(s, dir)),
    "dedup_simhash" -> simhash _,
    "dedup_simhash_pairs" -> simhashPairs _,
    "dedup_simhash_wide_pairs" -> simhashWidePairs _,
    "dedup_clusters" -> dedupClusters _,
    "dedup_keep_best" -> keepBest _,
    "dedup_soft_weights" -> softWeights _,
    "pipeline_soft_tokens" -> softTokens _,
    "dedup_chunk_prune" -> chunkPrune _,
    "sample_token_budget" -> tokenBudget _,
    "text_bm25_topk" -> bm25TopK _,
    "text_chunk_stride" -> chunkStride _,
    "text_cooccur_lift" -> cooccurLift _,
    "graph_common_neighbors" -> commonNeighbors _,
    "graph_anf" -> anfHyperball _,
    "graph_harmonic" -> harmonicCentrality _,
    "graph_lpa_modularity" -> lpaModularity _,
    "graph_mst" -> mstForest _,
    "graph_bfs_reach" -> bfsReach _,
    "dedup_containment_pairs" -> containmentPairs _,
    "dedup_threshold_curve" -> thresholdCurve _,
    "dedup_incremental" -> incrementalDedup _,
  )

  val oracles: Map[String, String] = Map(
    "dedup_edit_pairs" -> editPairsSql,
    "text_stats" -> textStatsSql,
    "text_surprisal" -> textSurprisalSql,
    "text_dsir_weights" -> dsirWeightsSql,
    "text_ppl_buckets" -> pplBucketsSql,
    "text_heaps_curve" -> heapsCurveSql,
    "text_pii_scrub" -> piiScrubSql,
    "text_pii_validate" -> piiValidateSql,
    "eval_pr_curve" -> prCurveSql,
    "eval_calibration" -> calibrationSql,
    "eval_ece" -> eceSql,
    "eval_auc_ranksum" -> aucRankSumSql,
    "eval_poisson_bootstrap" -> poissonBootstrapSql,
    "text_langid_confusion" -> langIdConfusionSql,
    "eval_cohens_kappa" -> cohensKappaSql,
    "eval_mcnemar" -> mcnemarSql,
    "graph_katz" -> katzGroupsSql,
    "text_lsa_power" -> lsaPowerSql,
    "text_lang_nb" -> langNbSql,
    "graph_degree_hist" -> degreeHistSql,
    "graph_kcore" -> kcoreSql,
    "text_zipf_curve" -> zipfCurveSql,
    "text_burstiness" -> burstinessSql,
    "eval_macro_f1" -> evalMacroF1Sql,
    "eval_rouge_n" -> evalRougeNSql,
    "eval_bradley_terry" -> evalBradleyTerrySql,
    "text_rake_phrases" -> rakePhrasesSql,
    "pipeline_keep_manifest" -> keepManifestSql,
    "pipeline_stage_funnel" -> stageFunnelSql,
    "text_bigram_surprisal" -> bigramSurprisalSql,
    "text_decontaminate" -> decontaminateSql,
    "text_ngram_topk" -> ngramTopKSql,
    "text_tfidf_terms" -> tfidfTopTermsSql,
    "text_pack_sequences" -> packSequencesSql,
    "text_pack_fragmentation" -> packFragmentationSql,
    "text_lang_id" -> langIdSql,
    "text_fingerprint" -> fingerprintSql,
    "text_quality" -> qualitySql,
    "text_repetition" -> repetitionSql,
    "text_gopher_rules" -> gopherRulesSql,
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_train_incremental" -> bpeTrainSql,
    "text_bpe_encode" -> bpeEncodeSql,
    "graph_pagerank" -> pageRankSql,
    "graph_pagerank_groups" -> pageRankGroupsSql,
    "text_textrank_terms" -> textRankTermsSql,
    "graph_resource_alloc" -> resourceAllocSql,
    "text_winnowing" -> winnowingMatchesSql,
    "graph_ppr" -> pprRankSql,
    "graph_ppr_groups" -> pprRankGroupsSql,
    "text_inverted_index" -> invertedIndexSql,
    "graph_triangles" -> trianglesSql,
    "graph_truss" -> trussSql,
    "graph_clustering_coeff" -> clusteringCoeffSql,
    "graph_component_sizes" -> componentSizesSql,
    "graph_diameter_probe" -> diameterProbeSql,
    "graph_assortativity" -> assortativitySql,
    "sample_leakage_split" -> leakageSafeSplitSql,
    "sample_group_kfold" -> groupKfoldSql,
    "dedup_lsh_tuning" -> lshTuningSql,
    "dedup_cluster_purity" -> clusterPuritySql,
    "sample_soft_budget" -> softBudgetSql,
    "dedup_bbit_pairs" -> bbitPairsSql,
    "text_corpus_profile" -> corpusProfileSql,
    "text_langid_margin" -> langIdMarginSql,
    "text_ngram_novelty" -> ngramNoveltySql,
    "dedup_exact" -> dedupExactSql,
    "dedup_cdc_chunks" -> cdcChunksSql,
    "dedup_minhash" -> minhashSql,
    "dedup_minhash_pairs" -> minhashPairsSql,
    "dedup_shingle_minhash" -> shingleMinhashSql,
    "dedup_shingle_pairs" -> shinglePairsSql,
    "dedup_ngram_overlap" -> ngramOverlapPairsSql,
    "text_dup_spans" -> dupSpanStatsSql,
    "text_dup_span_cuts" -> dupSpanCutsSql,
    "text_dup_span_apply" -> dupSpanApplySql,
    "dedup_jaccard_pairs" -> jaccardPairsSql,
    "dedup_prefix_pairs" -> prefixPairsSql,
    "dedup_recall_audit" -> recallAuditSql,
    "dedup_recall_audit_sampled" -> recallAuditSampledSql,
    "dedup_sorted_neighborhood" -> sortedNeighborhoodSql,
    "dedup_single_linkage" -> singleLinkageSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_simhash_wide_pairs" -> simhashWidePairsSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_keep_best" -> keepBestSql,
    "dedup_soft_weights" -> softWeightsSql,
    "pipeline_soft_tokens" -> softTokensSql,
    "dedup_chunk_prune" -> chunkPruneSql,
    "sample_token_budget" -> tokenBudgetSql,
    "text_bm25_topk" -> bm25TopKSql,
    "text_chunk_stride" -> chunkStrideSql,
    "text_cooccur_lift" -> cooccurLiftSql,
    "graph_common_neighbors" -> commonNeighborsSql,
    "graph_anf" -> anfHyperballSql,
    "graph_harmonic" -> harmonicCentralitySql,
    "graph_lpa_modularity" -> lpaModularitySql,
    "graph_mst" -> mstForestSql,
    "graph_bfs_reach" -> bfsReachSql,
    "dedup_containment_pairs" -> containmentPairsSql,
    "dedup_threshold_curve" -> thresholdCurveSql,
    "dedup_incremental" -> incrementalDedupSql,
  )
}
