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

  test("multi-table AriaStream crash-resume converges to the no-crash run") {
    import spark.implicits._
    val kc = Seq("table_id", "k")
    val tidValue: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      (tid, _) => concat(lit("v"), tid.cast("string"))
    def reg = (for (t <- 0L to 1L; k <- 1L to 10L)
      yield (t, k, s"orig${t}_$k")).toDF("table_id", "k", "f0")
    // contested within each table: tid t writes cell (t%2, t%10+1) and
    // reads the same k in the other table (the AriaStreamSpec workload)
    val ops = (1L to 24L).flatMap { t =>
      Seq((t, 0, t % 2, t % 10 + 1, true),
        (t, 1, 1L - t % 2, t % 10 + 1, false))
    }.toDF("tid", "opidx", "table_id", "k", "isUpdate")
    val b1 = ops.filter($"tid" <= 12L)
    val b2 = ops.filter($"tid" > 12L)

    def snap(e: AriaStream) = e.table.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    // reference run: no crash
    val sA = new AriaStream(reg, reorder = true, Seq("f0"), tidValue,
      Some(tmp("graft-mt-stateA")), keyCols = kc)
    sA.processBatch(b1, 0); sA.processBatch(b2, 1); sA.drain()

    // crashed run: batch 0 commits (possibly with carried aborts mid-
    // drain state), driver dies, a fresh engine resumes the composite-key
    // registry snapshot, the engine replays batch 0 (skipped), continues
    val stateB = tmp("graft-mt-stateB")
    val s1 = new AriaStream(reg, reorder = true, Seq("f0"), tidValue,
      Some(stateB), keyCols = kc)
    s1.processBatch(b1, 0)
    val h1 = s1.history
    val s2 = new AriaStream(reg.limit(0), reorder = true, Seq("f0"),
      tidValue, Some(stateB), keyCols = kc)
    assert(s2.history == h1, "resume must restore multi-table history")
    s2.processBatch(b1, 0) // post-crash replay
    assert(s2.history == h1, "replayed batch must be skipped")
    s2.processBatch(b2, 1)
    s2.drain()

    assert(s2.history == sA.history)
    assert(snap(s2) == snap(sA),
      "resumed multi-table registry must converge to the no-crash table")
    assert(s2.history.map(_._2).sum == 24L, "every txn commits exactly once")
  }

  test("MvSink crash-resume mid-stream folds each CDC batch exactly once") {
    import spark.implicits._
    // out-of-order CDC: key 5's delete arrives a batch before its insert
    // (transient negative carry must survive the crash-restore)
    val b1 = Seq((1L, 10L, 1), (1L, 20L, 1), (5L, 7L, -1)).toDF("key", "x", "op")
    val b2 = Seq((1L, 10L, -1), (5L, 7L, 1), (5L, 7L, 1), (9L, 3L, 1))
      .toDF("key", "x", "op")

    def viewOf(s: MvStream.MvSink): Map[Long, (Long, Long)] =
      s.view.map(_.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap)
        .getOrElse(Map.empty)

    // reference: no crash
    val a = new MvStream.MvSink("key", Some(tmp("graft-mv-stateA")))
    a.merge(b1, 0); a.merge(b2, 1)

    // crash after batch 0; a fresh sink resumes the committed view (incl.
    // the negative carry), skips the replayed batch 0, folds batch 1
    val stateB = tmp("graft-mv-stateB")
    val s1 = new MvStream.MvSink("key", Some(stateB))
    s1.merge(b1, 0)
    val s2 = new MvStream.MvSink("key", Some(stateB))
    assert(viewOf(s2) == viewOf(s1), "resume must restore the view")
    s2.merge(b1, 0) // post-crash replay: must be skipped
    assert(viewOf(s2) == viewOf(s1), "replayed batch must not double-fold")
    s2.merge(b2, 1)

    assert(viewOf(s2) == viewOf(a),
      "crash-resume view must equal the no-crash view")
    // exactly-once numbers: key 1 inserts 10+20 then deletes 10 ->
    // n=1 s=20; key 5 nets to n=1 s=7 (the early delete cancelled one
    // insert); key 9 n=1 s=3. A double-fold of either batch breaks one.
    assert(viewOf(s2) == Map(1L -> ((1L, 20L)), 5L -> ((1L, 7L)),
      9L -> ((1L, 3L))))
  }
}
