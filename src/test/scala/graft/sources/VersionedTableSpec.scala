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

  test("diff emits exactly the insert/update/delete delta between versions") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vtd").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v"), path)
    VersionedTable.merge(spark, path,
      Seq((2L, "B", 200.0), (9L, "z", 90.0)).toDF("k", "name", "v"), "k")
    VersionedTable.delete(spark, path, Seq(1L).toDF("k"), "k")

    def changes(from: Int, to: Int): Map[Long, String] =
      VersionedTable.diff(spark, path, from, to, "k").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes(0, 1) == Map(2L -> "update", 9L -> "insert"))
    assert(changes(1, 2) == Map(1L -> "delete"))
    assert(changes(0, 2) ==
      Map(1L -> "delete", 2L -> "update", 9L -> "insert"))
    assert(changes(0, 0).isEmpty)
    // a reversed range reads as the inverse feed
    assert(changes(2, 0) ==
      Map(1L -> "insert", 2L -> "update", 9L -> "delete"))

    // null-safe comparison: a column moving to NULL is an update
    VersionedTable.merge(spark, path,
      Seq((3L, Option.empty[String], 30.0)).toDF("k", "name", "v"), "k")
    assert(changes(2, 3) == Map(3L -> "update"))
    // and the _old/_new structs carry the payloads
    val r = VersionedTable.diff(spark, path, 2, 3, "k").collect()(0)
    assert(r.getStruct(2).getString(0) == "c" && r.getStruct(3).isNullAt(0))
  }

  test("diff rejects NULL keys instead of mis-diffing them") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vtn").toFile.getAbsolutePath + "/t"
    // a NULL-keyed row present in BOTH versions: the full-outer equi-join
    // would silently surface it as a spurious delete+insert pair
    VersionedTable.init(Seq((Some(1L), "a"), (None, "ghost"))
      .toDF("k", "name"), path)
    VersionedTable.merge(spark, path, Seq((Some(2L), "b")).toDF("k", "name"),
      "k")
    val e = intercept[Exception] {
      VersionedTable.diff(spark, path, 0, 1, "k").collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")),
      s"expected the non-null key error, got: ${e.getMessage}")
  }

  test("compact rejects sortBy + partitionBy together (layouts are exclusive)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vtx").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, "us", 1.0), (2L, "eu", 2.0))
      .toDF("k", "region", "v"), path)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.compact(spark, path, sortBy = Seq("k"),
        partitionBy = Seq("region"))
    }
    assert(e.getMessage.contains("not both"))
  }

  test("replace commits a full snapshot as the next version, preserving the writer's layout") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vtr").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, "a"), (2L, "b")).toDF("k", "name"), path)
    // regenerated snapshot, range-clustered by the writer
    val regen = (0L until 100L).map(k => (k, s"n$k")).toDF("k", "name")
      .repartitionByRange(4, col("k"))
    val v1 = VersionedTable.replace(spark, path, regen, statsCols = Seq("k"))
    assert(v1 == 1 && VersionedTable.versions(spark, path) == Seq(0, 1))
    assert(VersionedTable.read(spark, path).count() == 100)
    assert(VersionedTable.read(spark, path, 0).count() == 2)
    // the range clustering survived the commit: a point probe skips files
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 5L, 5L)
    assert(total == 4 && kept == 1, s"layout lost: $kept/$total")
    // replace without init is an error like merge
    intercept[IllegalArgumentException] {
      VersionedTable.replace(spark, path + "-none", regen)
    }
  }

  test("diff maintains a downstream aggregate incrementally (no snapshot rescan)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vti").toFile.getAbsolutePath + "/t"
    // (key, group, value): the consumer maintains sum(v)/count per group
    val base = (0L until 200L).map(k => (k, s"g${k % 5}", k.toDouble))
      .toDF("k", "grp", "v")
    VersionedTable.init(base, path)
    val agg0 = VersionedTable.read(spark, path, 0)
      .groupBy($"grp").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    // a merge (updates + inserts) and a delete, as separate versions
    VersionedTable.merge(spark, path,
      (0L until 30L).map(k => (k, s"g${k % 5}", k * 100.0))
        .toDF("k", "grp", "v")
        .union(Seq((900L, "g9", 9.0)).toDF("k", "grp", "v")), "k")
    VersionedTable.delete(spark, path, (150L until 170L).toDF("k"), "k")

    // incremental maintenance: fold ONLY the change feed into agg0 —
    // deletes/updates retract the old payload, inserts/updates add the new
    val d = VersionedTable.diff(spark, path, 0, 2, "k")
    val retract = d.filter($"_change".isin("delete", "update"))
      .select($"_old.grp".as("grp"), (-$"_old.v").as("v"), lit(-1L).as("dn"))
    val add = d.filter($"_change".isin("insert", "update"))
      .select($"_new.grp".as("grp"), $"_new.v".as("v"), lit(1L).as("dn"))
    val incr = agg0.select($"grp", $"s".as("v"), $"n".as("dn"))
      .unionByName(retract).unionByName(add)
      .groupBy($"grp").agg(sum($"v").as("s"), sum($"dn").as("n"))
      .filter($"n" > 0)

    val full = VersionedTable.read(spark, path, 2)
      .groupBy($"grp").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val gotI = incr.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getLong(2)))).toMap
    val gotF = full.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getLong(2)))).toMap
    assert(gotI == gotF)
    assert(gotI.contains("g9") && gotI("g9") == ((9.0, 1L)))
  }

  test("compact bin-packs small files; rows and time travel intact; sorted compaction tightens zone maps") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vtc").toFile.getAbsolutePath + "/t"
    def dataFiles(v: Int): Int =
      new java.io.File(s"$path/v=$v").listFiles()
        .count(_.getName.endsWith(".parquet"))
    // a "streaming sink accreted small files" layout: 16 files, keys shuffled
    val df = (0L until 400L).map(k => (k * 131 % 400, k * 1.5))
      .toDF("k", "v").repartition(16)
    VersionedTable.init(df, path, statsCols = Seq("k"))
    assert(dataFiles(0) == 16)

    // default 128 MB target >> data: everything packs into one file
    val v1 = VersionedTable.compact(spark, path, statsCols = Seq("k"))
    assert(v1 == 1 && VersionedTable.versions(spark, path) == Seq(0, 1))
    assert(dataFiles(1) == 1)
    assert(VersionedTable.read(spark, path, 1).collect().map(_.getLong(0))
      .sorted.sameElements(0L until 400L))
    // the pre-compaction snapshot is untouched (COW: readers of v0 unaffected)
    assert(dataFiles(0) == 16 &&
      VersionedTable.read(spark, path, 0).count() == 400)

    // sorted compaction: ~4 range-clustered files -> a point probe's zone
    // maps keep exactly one
    val bytes = new java.io.File(s"$path/v=1").listFiles().map(_.length).sum
    val v2 = VersionedTable.compact(spark, path,
      targetFileBytes = math.max(1L, (bytes + 3) / 4),
      sortBy = Seq("k"), statsCols = Seq("k"))
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 10L, 10L,
      version = v2)
    assert(total >= 3, s"expected a multi-file rewrite, got $total files")
    assert(kept == 1, s"sorted zones should keep exactly 1 file, kept $kept")
    assert(VersionedTable.scanPruned(spark, path, "k", 10L, 10L, version = v2)
      .collect().map(_.getLong(0)).sameElements(Seq(10L)))
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

  test("partitioned snapshots lay out hive-style and reads partition-prune") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt4").toFile.getAbsolutePath + "/t"
    val base = Seq((1L, "us", 1.0), (2L, "eu", 2.0), (3L, "us", 3.0))
      .toDF("k", "region", "v")
    VersionedTable.init(base, path, partitionBy = Seq("region"))
    assert(new java.io.File(s"$path/v=0/region=us").isDirectory)
    assert(new java.io.File(s"$path/v=0/region=eu").isDirectory)

    val v1 = VersionedTable.merge(spark, path,
      Seq((2L, "eu", 20.0), (4L, "ap", 4.0)).toDF("k", "region", "v"), "k",
      partitionBy = Seq("region"))
    assert(new java.io.File(s"$path/v=$v1/region=ap").isDirectory)

    val pruned = VersionedTable.read(spark, path).filter($"region" === "us")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("region"), scan.take(1500))
    assert(pruned.collect().map(_.getAs[Long]("k")).toSet == Set(1L, 3L))
    // merge semantics unaffected by layout
    assert(VersionedTable.read(spark, path).count() == 4)
  }

  test("partitioned snapshots round-trip string partition values type-exactly") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt6").toFile.getAbsolutePath + "/t"
    // "01" in a hive dir would come back as int 1 under partition-column
    // type inference; the stored snapshot schema must win
    val base = Seq((1L, "01", 1.0), (2L, "2", 2.0)).toDF("k", "bucket", "v")
    VersionedTable.init(base, path, partitionBy = Seq("bucket"))
    val back = VersionedTable.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      base.schema.map(f => (f.name, f.dataType)), back.schema.treeString)
    assert(back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "01", 2L -> "2"))
    // and the next merge keeps the value intact
    VersionedTable.merge(spark, path,
      Seq((3L, "03", 3.0)).toDF("k", "bucket", "v"), "k",
      partitionBy = Seq("bucket"))
    assert(VersionedTable.read(spark, path)
      .collect().map(_.getString(1)).toSet == Set("01", "2", "03"))
  }

  test("retain drops old versions; the kept chain stays readable") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt5").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, 1.0)).toDF("k", "v"), path)
    (1 to 3).foreach { i =>
      VersionedTable.merge(spark, path, Seq((i.toLong, i * 10.0)).toDF("k", "v"), "k")
    }
    assert(VersionedTable.versions(spark, path) == Seq(0, 1, 2, 3))
    val dropped = VersionedTable.retain(spark, path, keepLast = 2)
    assert(dropped == Seq(0, 1))
    assert(VersionedTable.versions(spark, path) == Seq(2, 3))
    assert(VersionedTable.read(spark, path).count() == 3) // latest intact
    intercept[Exception] { VersionedTable.read(spark, path, 0).collect() }
    intercept[IllegalArgumentException] {
      VersionedTable.retain(spark, path, keepLast = 0)
    }
  }

  test("zone-map stats skip files outside the probed range; results stay exact") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt6").toFile.getAbsolutePath + "/t"
    // range-partitioned layout → each of the 4 files holds a disjoint key
    // range, the layout zone maps are built for
    val df = (0L until 400L).map(k => (k, s"n$k", k * 1.5)).toDF("k", "name", "v")
      .repartitionByRange(4, col("k"))
    VersionedTable.init(df, path, statsCols = Seq("k", "v"))

    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 120L, 180L)
    assert(total == 4 && kept < total, s"expected skipping, got $kept/$total")

    val got = VersionedTable.scanPruned(spark, path, "k", 120L, 180L)
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(120L to 180L))

    // double column probes prune too, and the residual filter stays exact
    val (kv, tv) = VersionedTable.prunedFiles(spark, path, "v", 0.0, 10.0)
    assert(tv == 4 && kv == 1)
    assert(VersionedTable.scanPruned(spark, path, "v", 0.0, 10.0).count() == 7)

    // a probe entirely outside every zone reads zero files and zero rows
    val (k0, _) = VersionedTable.prunedFiles(spark, path, "k", 5000L, 6000L)
    assert(k0 == 0)
    assert(VersionedTable.scanPruned(spark, path, "k", 5000L, 6000L).count() == 0)
  }

  test("zone maps compose with hive partitioning (basePath keeps partition cols)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt7").toFile.getAbsolutePath + "/t"
    val df = (0L until 100L).map(k => (k, if (k % 2 == 0) "even" else "odd"))
      .toDF("k", "par").repartitionByRange(4, col("k"))
    VersionedTable.init(df, path, partitionBy = Seq("par"),
      statsCols = Seq("k"))
    val out = VersionedTable.scanPruned(spark, path, "k", 10L, 20L)
    assert(out.columns.toSeq == Seq("k", "par"), out.columns.mkString(","))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(10L to 20L))
    assert(rows.forall { case (k, p) => p == (if (k % 2 == 0) "even" else "odd") })
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 10L, 20L)
    assert(kept < total, s"expected skipping across $total files, kept $kept")
  }

  test("probing a column absent from statsCols degrades to a full filtered scan") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt9").toFile.getAbsolutePath + "/t"
    VersionedTable.init(
      (0L until 80L).map(k => (k, k * 3)).toDF("k", "x")
        .repartitionByRange(4, col("k")),
      path, statsCols = Seq("k"))
    // "x" has no zone maps: no pruning, but no crash and exact results
    assert(VersionedTable.prunedFiles(spark, path, "x", 0L, 29L) == ((0, 0)))
    assert(VersionedTable.scanPruned(spark, path, "x", 0L, 29L).count() == 10)
  }

  test("delete keeps zone maps when statsCols is passed through") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt10").toFile.getAbsolutePath + "/t"
    VersionedTable.init(
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s")
        .repartitionByRange(4, col("k")),
      path, statsCols = Seq("k"))
    VersionedTable.delete(spark, path, Seq(0L, 1L).toDF("k"), "k",
      statsCols = Seq("k"))
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 60L, 70L)
    assert(total > 0 && kept < total,
      s"delete dropped the zone maps: kept $kept of $total")
    assert(VersionedTable.scanPruned(spark, path, "k", 60L, 70L).count() == 11)
  }

  test("timestamp zone maps prune with Timestamp probes; mismatched probe types never prune") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt11").toFile.getAbsolutePath + "/t"
    // 4 files of one day each (Jan 1–4 1995), hour resolution
    val df = (0L until 96L)
      .map(h => (h, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(1995, 1, 1, 0, 0).plusHours(h.toInt))))
      .toDF("id", "ts").repartitionByRange(4, col("ts"))
    VersionedTable.init(df, path, statsCols = Seq("ts"))

    val lo = java.sql.Timestamp.valueOf("1995-01-02 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-01-02 23:00:00")
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "ts", lo, hi)
    assert(total == 4 && kept == 1, s"expected 1/4 files, got $kept/$total")
    assert(VersionedTable.scanPruned(spark, path, "ts", lo, hi).count() == 24)

    // Instant probes land on the same micros axis
    val (ki, _) = VersionedTable.prunedFiles(spark, path, "ts",
      lo.toInstant, hi.toInstant)
    assert(ki == 1)

    // a LocalDate probe against a timestamp column must disable pruning,
    // not guess an axis (days vs micros would prune every file)
    val (kd, td) = VersionedTable.prunedFiles(spark, path, "ts",
      java.time.LocalDate.of(1995, 1, 2), java.time.LocalDate.of(1995, 1, 2))
    assert(kd == td, s"mismatched probe type must keep all files: $kd/$td")
  }

  test("scanPruned falls back to a plain filtered read without a stats sidecar") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-vt8").toFile.getAbsolutePath + "/t"
    VersionedTable.init((0L until 50L).map(k => (k, k * 2)).toDF("k", "x"), path)
    val (kept, total) = VersionedTable.prunedFiles(spark, path, "k", 0L, 9L)
    assert((kept, total) == ((0, 0)))
    assert(VersionedTable.scanPruned(spark, path, "k", 0L, 9L).count() == 10)
  }

  test("OCC merge: an interleaved stale writer loses the CAS, rebases, and no update is lost") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-occ").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, "a")).toDF("k", "name"), path)

    // writer A reads head 0 … then writer B commits v1 under A's feet
    val baseSeenByA = VersionedTable.latestVersion(spark, path).get
    assert(baseSeenByA == 0)
    assert(VersionedTable.merge(spark, path,
      Seq((2L, "from-B")).toDF("k", "name"), "k") == 1)

    // A's CAS attempt at its stale base must FAIL, not corrupt v1
    val ex = intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.tryMergeAt(spark, path,
        Seq((3L, "from-A")).toDF("k", "name"), "k", baseSeenByA)
    }
    assert(ex.version == 1)
    // v1 is still exactly B's commit — the loser never tore the winner
    assert(VersionedTable.read(spark, path, 1).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // the retry loop rebases onto the new head: both writers' rows land
    val v2 = VersionedTable.mergeOcc(spark, path,
      Seq((3L, "from-A")).toDF("k", "name"), "k")
    assert(v2 == 2)
    assert(VersionedTable.versions(spark, path) == Seq(0, 1, 2))
    val byKey = VersionedTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey == Map(1L -> "a", 2L -> "from-B", 3L -> "from-A"))
  }

  test("OCC merge: two genuinely concurrent writers both land (threaded, no lost update)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-occ2").toFile.getAbsolutePath + "/t"
    VersionedTable.init(Seq((1L, 0L)).toDF("k", "v"), path)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (2L to 5L).map { k =>
      Future(VersionedTable.mergeOcc(spark, path,
        Seq((k, k * 10L)).toDF("k", "v"), "k"))
    }
    val versionsLanded = Await.result(Future.sequence(writers), 5.minutes)
    // every writer landed in a distinct version of a linear history
    assert(versionsLanded.toSet.size == 4)
    assert(VersionedTable.versions(spark, path) == Seq(0, 1, 2, 3, 4))
    val byKey = VersionedTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey ==
      Map(1L -> 0L, 2L -> 20L, 3L -> 30L, 4L -> 40L, 5L -> 50L))
  }
}
