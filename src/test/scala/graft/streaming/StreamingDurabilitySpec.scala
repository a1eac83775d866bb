package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.aria.TxnGen.Op

/** Failure recovery for the streaming surfaces: a stateful query must
  * resume its keyed state from the checkpoint after the query is killed
  * (under the RocksDB state store, the production provider), and a crashed
  * AriaStream must resume its persisted (table, pending, history) snapshot
  * and converge to exactly the no-crash result, skipping replayed batches.
  */
class StreamingDurabilitySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("mapGroupsWithState resumes from checkpoint under RocksDB state store") {
    import spark.implicits._
    val in = tmp("graft-dur-in")
    val ckpt = tmp("graft-dur-ckpt")
    EventStreams.rocksDbStateStore.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      Seq((7L, ts(1)), (7L, ts(2)), (7L, ts(3)), (8L, ts(1)))
        .toDF("user_id", "ts").write.mode("append").parquet(in)
      val schema = spark.read.parquet(in).schema
      // foreachBatch, not the memory sink: only durable sinks may recover
      // from a checkpoint
      val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
      def runOnce(): Unit = {
        val q = EventStreams.runningUserState(
            EventStreams.readEvents(spark, in, schema))
          .writeStream.outputMode("update")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[EventStreams.UserAgg], _: Long) =>
              b.collect().foreach { a =>
                seen(a.user_id) =
                  math.max(seen.getOrElse(a.user_id, 0L), a.n_events)
              }
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      assert(seen(7L) == 3L)
      // kill/restart: a NEW query over the SAME checkpoint sees only the
      // two new events — n_events reaches 5 only if state was restored
      seen.clear()
      Seq((7L, ts(4)), (7L, ts(5))).toDF("user_id", "ts")
        .write.mode("append").parquet(in)
      runOnce()
      assert(seen(7L) == 5L, "restored state must carry the pre-restart count")
    } finally EventStreams.rocksDbStateStore.keys.foreach(spark.conf.unset)
  }

  test("AriaStream crash-resume converges to the no-crash run exactly") {
    import spark.implicits._
    val newValue: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      (tid, ep) =>
        concat(lit("v"), tid.cast("string"), lit("e"), ep.cast("string"))
    def base = (1L to 30L).map(k => (k, s"orig$k")).toDF("k", "f0")
    val rng = new scala.util.Random(5)
    def batch(tids: Range): Seq[Op] = tids.flatMap { tid =>
      (0 until 1 + rng.nextInt(5)).map(i =>
        Op(tid.toLong, i, 1L + rng.nextInt(30), rng.nextDouble() < 0.5))
    }
    val b1 = batch(1 to 8)
    val b2 = batch(9 to 16)

    // reference run: no crash
    val sA = new AriaStream(base, reorder = true, Seq("f0"), newValue,
      Some(tmp("graft-aria-stateA")))
    sA.processBatch(b1.toDF(), 0)
    sA.processBatch(b2.toDF(), 1)
    sA.drain()

    // crashed run: batch 0, then the driver "dies" (s1 dropped), a fresh
    // engine resumes from stateDir, the streaming engine replays batch 0
    // (must be skipped), then batch 1 and the drain proceed
    val stateB = tmp("graft-aria-stateB")
    val s1 = new AriaStream(base, reorder = true, Seq("f0"), newValue,
      Some(stateB))
    s1.processBatch(b1.toDF(), 0)
    val historyAfterB1 = s1.history

    val s2 = new AriaStream(base, reorder = true, Seq("f0"), newValue,
      Some(stateB))
    assert(s2.history == historyAfterB1, "resume must restore history")
    s2.processBatch(b1.toDF(), 0) // post-crash replay: already applied
    assert(s2.history == historyAfterB1, "replayed batch must be skipped")
    s2.processBatch(b2.toDF(), 1)
    s2.drain()

    assert(s2.history == sA.history)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap(s2.table) == snap(sA.table))
  }
}
