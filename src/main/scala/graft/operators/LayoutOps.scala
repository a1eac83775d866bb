package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Physical-layout planning: measure how a table's FILE LAYOUT changes
  * how much of it a range probe must read. The zone-map arithmetic every
  * lakehouse scan planner runs (parquet row-group min/max, Delta/Iceberg
  * file stats), here as a first-class query so the layout decision is a
  * measured number instead of folklore.
  *
  * Two layouts of the same lineitem rows into 64 files:
  *   - `psort`  — range-sorted by partkey bin (the single-column OPTIMIZE):
  *     perfect pruning on partkey probes, zero on supplier probes.
  *   - `zorder` — Morton-interleaved (partkey bin, suppkey bin) high bits
  *     ([[Layout.zOrder2]] — what OPTIMIZE ZORDER BY computes): both
  *     dimensions get locality ∝ √files.
  *
  * Two probes over the per-file zone maps:
  *   - `box_2d`  — partkey ∈ [16,23] AND suppkey ∈ [16,23] bins (1/64 of
  *     the key plane): psort must read every 8×-wider partkey stripe
  *     (8 files); zorder reads the single file whose high interleaved
  *     bits match the box.
  *   - `p_range` — partkey ∈ [16,23], supplier unconstrained: psort reads
  *     its 8 matching files; zorder also reads 8 (all supplier quadrants
  *     of the partkey stripe) — the trade is symmetric, not free.
  *
  * Output per (layout, probe): files scanned, rows scanned (the I/O the
  * zone maps cannot avoid), and the exact matching rows (identical across
  * layouts — layout changes I/O, never answers).
  *
  * Scale: the binning pass is one scan (the max() normalizers are 1-row
  * broadcasts); each layout's zone map is a 64-row aggregate; probes
  * evaluate on the bounded zone-map frames. At 100 TB the same arithmetic
  * runs per parquet file footer — nothing here grows with the data except
  * the one scan.
  */
object LayoutOps {

  private val B = 64L // files per layout; 6 bits per dimension

  def zorderSkipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_partkey".as("p"), $"l_suppkey".as("sk"))
    val mx = li.agg(max($"p").as("mp"), max($"sk").as("ms"))
    val binned = li.crossJoin(broadcast(mx))
      .select((($"p" * B) / ($"mp" + 1L)).cast("long").as("bp"),
        (($"sk" * B) / ($"ms" + 1L)).cast("long").as("bs"))

    def zoneMap(withFile: DataFrame, layout: String): DataFrame =
      withFile.groupBy($"file").agg(
          min($"bp").as("min_p"), max($"bp").as("max_p"),
          min($"bs").as("min_s"), max($"bs").as("max_s"),
          count(lit(1)).as("nrows"))
        .withColumn("layout", lit(layout))

    val files = zoneMap(binned.withColumn("file",
        (Layout.zOrder2($"bp", $"bs", 6) / B).cast("long")), "zorder")
      .unionByName(zoneMap(binned.withColumn("file", $"bp"), "psort"))

    // probe overlap tests against the zone maps (files_total rides along
    // so the pruning ratio is self-contained)
    def ov(plo: Long, phi: Long, slo: Long, shi: Long) =
      !($"max_p" < plo || $"min_p" > phi || $"max_s" < slo || $"min_s" > shi)
    val scanned = files.groupBy($"layout").agg(
      count(lit(1)).as("files_total"),
      count(when(ov(16, 23, 16, 23), 1)).as("fs1"),
      sum(when(ov(16, 23, 16, 23), $"nrows")).as("rs1"),
      count(when(ov(16, 23, 0, 63), 1)).as("fs2"),
      sum(when(ov(16, 23, 0, 63), $"nrows")).as("rs2"))
    val perProbe = scanned.select($"layout", $"files_total", explode(array(
        struct(lit("box_2d").as("probe"), $"fs1".as("files_scanned"),
          $"rs1".as("rows_scanned")),
        struct(lit("p_range").as("probe"), $"fs2".as("files_scanned"),
          $"rs2".as("rows_scanned")))).as("e"))
      .select($"layout", $"e.probe".as("probe"), $"files_total",
        $"e.files_scanned".as("files_scanned"),
        $"e.rows_scanned".as("rows_scanned"))

    val matched = binned.agg(
        count(when($"bp".between(16, 23) && $"bs".between(16, 23), 1))
          .as("m1"),
        count(when($"bp".between(16, 23), 1)).as("m2"))
      .select(explode(array(
        struct(lit("box_2d").as("probe"), $"m1".as("rows_matched")),
        struct(lit("p_range").as("probe"), $"m2".as("rows_matched"))))
        .as("e"))
      .select($"e.probe".as("probe"), $"e.rows_matched".as("rows_matched"))

    perProbe.join(broadcast(matched), Seq("probe"))
      .select($"layout", $"probe", $"files_total", $"files_scanned",
        $"rows_scanned", $"rows_matched")
      .orderBy($"layout", $"probe")
  }

  /** The zOrder2 bit arithmetic as SQL — generated from the same loop
    * shape so the two engines cannot drift.
    */
  private val zSql: String = (0 until 6).map(j =>
    s"(((bp >> $j) & 1) << ${2 * j}) | (((bs >> $j) & 1) << ${2 * j + 1})")
    .mkString(" | ")

  val zorderSkippingSql: String =
    s"""WITH mx AS (
       |  SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
       |binned AS (
       |  SELECT (l_partkey * 64) // (mp + 1) AS bp,
       |         (l_suppkey * 64) // (ms + 1) AS bs
       |  FROM lineitem, mx),
       |zf AS (
       |  SELECT 'zorder' AS layout, ($zSql) // 64 AS file,
       |    min(bp) AS min_p, max(bp) AS max_p,
       |    min(bs) AS min_s, max(bs) AS max_s, count(*)::BIGINT AS nrows
       |  FROM binned GROUP BY 1, 2),
       |pf AS (
       |  SELECT 'psort' AS layout, bp AS file,
       |    min(bp) AS min_p, max(bp) AS max_p,
       |    min(bs) AS min_s, max(bs) AS max_s, count(*)::BIGINT AS nrows
       |  FROM binned GROUP BY 1, 2),
       |files AS (SELECT * FROM zf UNION ALL SELECT * FROM pf),
       |probes AS (
       |  SELECT * FROM (VALUES ('box_2d', 16, 23, 16, 23),
       |                        ('p_range', 16, 23, 0, 63))
       |    t(probe, plo, phi, slo, shi)),
       |scanned AS (
       |  SELECT f.layout, p.probe,
       |    count(*)::BIGINT AS files_total,
       |    count(*) FILTER (NOT (f.max_p < p.plo OR f.min_p > p.phi
       |      OR f.max_s < p.slo OR f.min_s > p.shi))::BIGINT
       |      AS files_scanned,
       |    sum(f.nrows) FILTER (NOT (f.max_p < p.plo OR f.min_p > p.phi
       |      OR f.max_s < p.slo OR f.min_s > p.shi))::BIGINT
       |      AS rows_scanned
       |  FROM files f CROSS JOIN probes p GROUP BY 1, 2),
       |matched AS (
       |  SELECT p.probe, count(*) FILTER (b.bp BETWEEN p.plo AND p.phi
       |    AND b.bs BETWEEN p.slo AND p.shi)::BIGINT AS rows_matched
       |  FROM probes p CROSS JOIN binned b GROUP BY 1)
       |SELECT s.layout, s.probe, s.files_total, s.files_scanned,
       |  s.rows_scanned, m.rows_matched
       |FROM scanned s JOIN matched m ON s.probe = m.probe
       |ORDER BY s.layout, s.probe""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorderSkipping _))

  val oracles: Map[String, String] = Map(
    "layout_zorder" -> zorderSkippingSql)
}
