package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** zOrder2 + zone maps = multi-dimensional data skipping: a z-ordered
  * snapshot must prune file probes on EITHER dimension, where a plain sort
  * prunes only its leading column.
  */
class LayoutSpec extends SparkSpec {

  test("zOrder2 interleaves bits (known values)") {
    import spark.implicits._
    // a=0b101 → even positions {0,4} = 0b10001; b=0b011 → odd positions
    // {1,3} = 0b01010; z = 0b11011 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zOrder2(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L, s"expected 27, got $z")
  }

  test("z-ordered snapshot prunes range probes on both dimensions") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-zo").toFile.getAbsolutePath + "/t"
    // 64×64 grid of (a, b): every combination once, so neither column is
    // correlated with the other — the adversarial case for a linear sort
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
    val z = grid.withColumn("z", Layout.zOrder2(col("a"), col("b"), 6))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
    VersionedTable.init(z, path, statsCols = Seq("a", "b"))

    val (ka, ta) = VersionedTable.prunedFiles(spark, path, "a", 0L, 7L)
    val (kb, tb) = VersionedTable.prunedFiles(spark, path, "b", 0L, 7L)
    assert(ta == 16 && tb == 16)
    // an eighth-of-the-range probe on either dim must skip at least half
    // the files (z-curve locality); a linear sort would keep all 16 on the
    // trailing dimension
    assert(ka <= 8, s"a-probe kept $ka of $ta")
    assert(kb <= 8, s"b-probe kept $kb of $tb")
    // and results stay exact
    assert(VersionedTable.scanPruned(spark, path, "a", 0L, 7L).count() == 8 * 64)
    assert(VersionedTable.scanPruned(spark, path, "b", 0L, 7L).count() == 8 * 64)

    // contrast: the same data sorted linearly by a prunes a but not b
    val path2 = Files.createTempDirectory("graft-zo2").toFile.getAbsolutePath + "/t"
    VersionedTable.init(grid.repartitionByRange(16, col("a")),
      path2, statsCols = Seq("a", "b"))
    val (kb2, tb2) = VersionedTable.prunedFiles(spark, path2, "b", 0L, 7L)
    assert(tb2 == 16 && kb2 == 16,
      s"linear layout unexpectedly pruned the trailing dim: $kb2/$tb2")
  }
}
