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
    *
    * The exists-then-rename pair alone is a TOCTOU race whose outcome
    * depends on filesystem rename semantics: local FS refuses to rename
    * onto an existing directory (rename returns false), but HDFS/posix-mv
    * semantics move the temp dir INSIDE the existing destination and
    * report success. So the marker carries a per-attempt commit id and the
    * writer verifies, after the rename, that the marker at `dest` is its
    * own — a loser whose rename "succeeded" into a concurrently-committed
    * dest sees the winner's id, cleans up its nested stray, and fails.
    */
  def commit(spark: SparkSession, dest: String)(write: String => Unit): Unit = {
    val destPath = new Path(dest)
    val parent = destPath.getParent
    val commitId = java.util.UUID.randomUUID.toString
    val tmp = new Path(parent, s".tmp-${destPath.getName}-$commitId")
    write(tmp.toString)
    val f = fs(spark, dest)
    val out = f.create(new Path(tmp, Marker), true)
    out.write(commitId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (f.exists(destPath) || !f.rename(tmp, destPath)) {
      f.delete(tmp, true)
      throw new IllegalStateException(s"$dest was committed concurrently")
    }
    if (!verifyOwnCommit(spark, destPath, tmp.getName, commitId)) {
      // rename-onto-existing "succeeded" by nesting tmp inside the
      // winner's dest; remove our stray and report the lost race
      f.delete(new Path(destPath, tmp.getName), true)
      throw new IllegalStateException(s"$dest was committed concurrently")
    }
    // Post-commit housekeeping: the snapshot is durable at this point, so a
    // sweep failure must not surface as a commit failure (the caller would
    // roll back state that IS on disk and livelock on retry).
    try sweepStaleTmp(spark, parent.toString)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"AtomicDir: post-commit temp sweep under $parent failed " +
            s"(ignored): $e")
    }
  }

  /** Post-rename ownership check. A lost rename-onto-existing race always
    * leaves our temp dir nested INSIDE the winner's dest, so when the
    * marker read itself fails with an IO error (ambiguous: the commit may
    * well have taken effect) we fall back to that structural signal rather
    * than reporting a phantom lost race — `commit` must only throw when the
    * commit truly didn't take effect.
    */
  private def verifyOwnCommit(spark: SparkSession, destPath: Path,
      tmpName: String, commitId: String): Boolean =
    try markerContent(spark, destPath.toString).contains(commitId)
    catch {
      case _: java.io.IOException =>
        !fs(spark, destPath.toString).exists(new Path(destPath, tmpName))
    }

  /** Contents of the commit marker at `dir`, if present. */
  private def markerContent(spark: SparkSession, dir: String): Option[String] = {
    val f = fs(spark, dir)
    val m = new Path(dir, Marker)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
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
