package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws for the SemDeDup-style cell-scoped dedup and the LSH k-NN graph —
  * structural invariants checked against the sibling operators they refine
  * (the full exact-cosine clustering, the fixed-query LSH probe), not just
  * row counts.
  */
class SemanticDedupSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("semanticDedup: one keeper per group, groups are cell-consistent " +
      "refinements of the full-graph clusters") {
    import spark.implicits._
    val out = Similarity.semanticDedup(spark, dir).localCheckpoint(true)
    val total = Tables.embeddings(spark, dir).count()

    // one row per vector, exactly one keeper per group
    assert(out.count() == total)
    assert(out.select($"vec_id").distinct().count() == total)
    val keepers = out.groupBy($"grp")
      .agg(sum($"is_kept").as("k"), count(lit(1)).as("n"))
    assert(keepers.filter($"k" =!= 1).count() == 0)

    // the group label is the smallest member id (star-contraction invariant)
    val minMember = out.groupBy($"grp").agg(min($"vec_id").as("mn"))
    assert(minMember.filter($"grp" =!= $"mn").count() == 0)

    // pairs are cell-scoped, so every group's members share one cell
    val cellsPerGrp = out.groupBy($"grp")
      .agg(countDistinct($"cell").as("nc"), count(lit(1)).as("n"))
    assert(cellsPerGrp.filter($"n" > 1 && $"nc" =!= 1).count() == 0)

    // cell-scoping only REMOVES pairs vs the full exact-cosine graph, so
    // each semantic group must sit inside ONE full-graph cluster
    val full = Similarity.semanticClusters(spark, dir)
      .select($"vec_id", $"cluster")
    val spans = out.join(full, Seq("vec_id"))
      .groupBy($"grp").agg(countDistinct($"cluster").as("nc"))
    assert(spans.filter($"nc" =!= 1).count() == 0)
  }

  test("semanticDedup holds its laws at a non-default cell count") {
    import spark.implicits._
    val out = Similarity.semanticDedup(spark, dir, nCells = 4)
      .localCheckpoint(true)
    assert(out.count() == Tables.embeddings(spark, dir).count())
    val keepers = out.groupBy($"grp")
      .agg(sum($"is_kept").as("k"), countDistinct($"cell").as("nc"),
        count(lit(1)).as("n"))
    assert(keepers.filter($"k" =!= 1).count() == 0)
    assert(keepers.filter($"n" > 1 && $"nc" =!= 1).count() == 0)
    // fewer cells -> bigger cells -> the pair graph can only GAIN edges:
    // the default-cells grouping must refine the 4-cell grouping wherever
    // cells agree... the cheap universal law is cell-id range
    assert(out.agg(max($"cell")).collect()(0).getLong(0) < 4)
  }

  test("knnGraph agrees with lshTopK on the probe-query set") {
    import spark.implicits._
    val g = Similarity.knnGraph(spark, dir)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"nbr".as("vec_id"), $"cos", $"rn")
    val probe = Similarity.lshTopK(spark, dir)
    // same candidates, same exact scores, same ranking — the graph build
    // is the probe generalized to every node, so on the probe set the two
    // must be row-identical
    assert(g.exceptAll(probe).count() == 0)
    assert(probe.exceptAll(g).count() == 0)
    // ranks are dense from 1 and capped at 3 for every node in the graph
    val byNode = Similarity.knnGraph(spark, dir)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n"), min($"rn").as("lo"), max($"rn").as("hi"))
    assert(byNode.filter($"lo" =!= 1 || $"hi" =!= $"n" || $"n" > 3)
      .count() == 0)
  }
}
