package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Versioned COW table: init → merge → delete with time travel. */
class VersionedTableSpec extends SparkSpec {

  test("merge and delete produce addressable versions; time travel reads old state") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt").toFile.getAbsolutePath + "/t"
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    VersionedTable.init(base, path)
    assert(VersionedTable.versions(spark, path) == Seq(0))

    val v1 = VersionedTable.merge(spark, path,
      Seq((2L, "B", 200.0), (9L, "z", 90.0)).toDF("k", "name", "v"), "k")
    assert(v1 == 1)
    val v2 = VersionedTable.delete(spark, path, Seq(1L).toDF("k"), "k")
    assert(v2 == 2)
    assert(VersionedTable.versions(spark, path) == Seq(0, 1, 2))

    def snap(v: Int) = VersionedTable.read(spark, path, v)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(snap(0) == Map(1L -> (("a", 10.0)), 2L -> (("b", 20.0)),
      3L -> (("c", 30.0))))
    assert(snap(1) == Map(1L -> (("a", 10.0)), 2L -> (("B", 200.0)),
      3L -> (("c", 30.0)), 9L -> (("z", 90.0))))
    assert(snap(2) == snap(1) - 1L)
    // latest == v2
    assert(VersionedTable.read(spark, path).count() == 3)
  }

  test("merge without init fails with a clear error") {
    val path = Files.createTempDirectory("graft-vt2").toFile.getAbsolutePath + "/t"
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, path, Seq((1L, 1.0)).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("init first"))
  }

  test("a partial (crashed) version directory is never visible as committed") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt3").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, 1.0)).toDF("k", "v"), path)
    // simulate a writer that died mid-commit: a v= directory with data
    // files but no _GRAFT_COMMIT marker (AtomicDir.Marker — the commit
    // protocol's own stamp, distinct from the parquet committer's _SUCCESS)
    val partial = new java.io.File(s"$path/v=7")
    assert(partial.mkdirs())
    Files.write(partial.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(VersionedTable.versions(spark, path) == Seq(0),
      "partial directory must be invisible")
    // readers and the next merge still address the committed chain only
    assert(VersionedTable.read(spark, path).count() == 1)
  }
}
