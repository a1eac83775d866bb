package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.kv.KvOps

/** Minimal versioned copy-on-write table on plain parquet: each MERGE
  * writes a complete new snapshot under `path/v=N`, and reads address any
  * version (time travel) or the latest. This is the durable form of the
  * engine's version-production model — the Aria install phase and the
  * streaming KV sink both produce "next table versions"; this sink gives
  * those versions a lifecycle on disk.
  *
  * Scale notes: snapshots are plain parquet directories, so every reader
  * optimization (pushdown, pruning, partitioning) applies; MERGE is the
  * one-shuffle last-writer-wins upsert from [[KvOps.upsert]]. Full-snapshot
  * rewrite per version is the simplest correct COW scheme — file-level
  * deltas (what Delta/Iceberg add) are an optimization of the same model.
  * Listing uses the Hadoop FileSystem API, so any hadoop-compatible store
  * works, not just local disk.
  */
object VersionedTable {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(path: String, v: Int) = s"$path/v=$v"

  /** Atomic commit: write the snapshot to a hidden temp directory, then
    * rename into `v=N` — a crashed or in-flight write can never surface as
    * a committed version, and a lost rename race (concurrent committer of
    * the same N) cleans up and fails instead of corrupting the winner.
    * `versions()` additionally requires the parquet `_SUCCESS` marker.
    */
  private def commitVersion(df: DataFrame, path: String, v: Int): Unit = {
    val spark = df.sparkSession
    val tmp = s"$path/.tmp-v$v-${java.util.UUID.randomUUID}"
    df.write.mode("errorifexists").parquet(tmp)
    val f = fs(spark, path)
    val dest = new Path(versionDir(path, v))
    if (f.exists(dest) || !f.rename(new Path(tmp), dest)) {
      f.delete(new Path(tmp), true)
      throw new IllegalStateException(
        s"version $v at $path was committed concurrently")
    }
  }

  /** All committed version numbers, ascending (only `_SUCCESS`-marked
    * directories count — partial writes are invisible).
    */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath)
      .filter(d => d.getName.startsWith("v=") &&
        f.exists(new Path(d, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toInt)
      .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption

  /** Create version 0. */
  def init(df: DataFrame, path: String): Unit =
    commitVersion(df, path, 0)

  /** Read a specific version (time travel) or the latest. */
  def read(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val v =
      if (version >= 0) version
      else latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no versions at $path"))
    spark.read.parquet(versionDir(path, v))
  }

  /** MERGE: last-writer-wins upsert of `updates` (key-unique) into the
    * latest snapshot, committed as the next version. Returns the new
    * version number.
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String): Int = {
    val current = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path — init first"))
    val next = current + 1
    commitVersion(
      KvOps.upsert(read(spark, path, current), updates, keyCol), path, next)
    next
  }

  /** Delete keys (anti join), committed as the next version. */
  def delete(spark: SparkSession, path: String, keys: DataFrame,
      keyCol: String): Int = {
    val current = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no versions at $path — init first"))
    val next = current + 1
    commitVersion(
      KvOps.delete(read(spark, path, current), keys, keyCol), path, next)
    next
  }
}
