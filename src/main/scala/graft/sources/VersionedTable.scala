package graft.sources

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

  private def versionDir(path: String, v: Int) = s"$path/v=$v"

  /** Atomic commit via [[AtomicDir]]: a crashed or in-flight write can
    * never surface as a committed version, and a lost rename race
    * (concurrent committer of the same N) cleans up and fails instead of
    * corrupting the winner.
    */
  private def commitVersion(df: DataFrame, path: String, v: Int): Unit =
    AtomicDir.commit(df.sparkSession, versionDir(path, v)) { tmp =>
      df.write.mode("errorifexists").parquet(tmp)
    }

  /** All committed version numbers, ascending (only marker-stamped
    * directories count — partial writes are invisible).
    */
  def versions(spark: SparkSession, path: String): Seq[Int] =
    AtomicDir.committed(spark, path, "v=")

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
