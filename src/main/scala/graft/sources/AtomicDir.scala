package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic directory commits on any Hadoop-compatible filesystem: content is
  * written to a hidden sibling temp directory, stamped with the engine's own
  * `_GRAFT_COMMIT` marker (independent of the parquet committer's
  * `_SUCCESS`, which sessions may disable), and renamed into place. A
  * reader lists only marker-stamped directories, so a crashed or in-flight
  * writer can never surface partial data, regardless of committer conf.
  *
  * Shared by [[VersionedTable]] (COW snapshots) and
  * [[graft.streaming.AriaStream]] (epoch state snapshots).
  */
object AtomicDir {

  val Marker = "_GRAFT_COMMIT"

  /** Temp dirs from writers that died before their rename are swept once
    * they are comfortably older than any plausible in-flight commit.
    */
  private val TmpSweepAgeMs = 10 * 60 * 1000L

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write via `write(tmpPath)`, stamp the marker, rename into `dest`.
    * Fails (and cleans the temp dir) if `dest` was committed concurrently.
    * After a successful commit, sweeps stale orphaned temp dirs.
    */
  def commit(spark: SparkSession, dest: String)(write: String => Unit): Unit = {
    val destPath = new Path(dest)
    val parent = destPath.getParent
    val tmp = new Path(parent,
      s".tmp-${destPath.getName}-${java.util.UUID.randomUUID}")
    write(tmp.toString)
    val f = fs(spark, dest)
    f.create(new Path(tmp, Marker), true).close()
    if (f.exists(destPath) || !f.rename(tmp, destPath)) {
      f.delete(tmp, true)
      throw new IllegalStateException(s"$dest was committed concurrently")
    }
    sweepStaleTmp(spark, parent.toString)
  }

  /** Committed (marker-stamped) directories named `<prefix><int>` under
    * `parent`, as sorted ints.
    */
  def committed(spark: SparkSession, parent: String, prefix: String): Seq[Int] = {
    val p = new Path(parent)
    val f = fs(spark, parent)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath)
      .filter(d => d.getName.startsWith(prefix) &&
        f.exists(new Path(d, Marker)))
      .map(_.getName.stripPrefix(prefix).toInt)
      .sorted
  }

  private def sweepStaleTmp(spark: SparkSession, parent: String): Unit = {
    val f = fs(spark, parent)
    val p = new Path(parent)
    if (f.exists(p)) {
      val cutoff = System.currentTimeMillis() - TmpSweepAgeMs
      f.listStatus(p).toSeq
        .filter(s => s.getPath.getName.startsWith(".tmp-") &&
          s.getModificationTime < cutoff)
        .foreach(s => f.delete(s.getPath, true))
    }
  }
}
