package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Events, Sketches}
import graft.sources.Tables

/** Streaming ≡ batch: the incremental windowed aggregations must converge to
  * the batch result on the same data (Spark's unified semantics), and the
  * foreachBatch KV sink must fold micro-batches into one snapshot.
  */
class EventStreamsSpec extends SparkSpec {

  private lazy val stagingDir = {
    // stage events as several files so the file source produces multiple
    // micro-batches (maxFilesPerTrigger=1)
    val dir = Files.createTempDirectory("graft-events").toFile.getAbsolutePath
    Tables.events(spark, sf("sf0.001")).repartition(3)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling counts converge to the batch result") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val agg = EventStreams.tumblingCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling_out")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n_events"))
      .collect().map(_.toSeq).sortBy(_.toString())
    val want = Events.tumbling(spark, sf("sf0.001"))
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect().map(_.toSeq).sortBy(_.toString())
    assert(got.length == want.length && got.sameElements(want))
  }

  test("stream-static enrichment equals the batch join and keeps dimensionless events") {
    val schema = spark.read.parquet(stagingDir).schema
    // static dimension: a tier per user, deliberately missing user 0 so the
    // left-join survival contract is exercised
    val dim = spark.range(1, 50)
      .select(col("id").as("user_id"),
        concat(lit("tier"), col("id") % 3).as("tier"))
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val q = EventStreams.enrichStatic(stream, dim, "user_id")
      .select(col("event_id"), col("user_id"), col("tier"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
    val want = spark.read.parquet(stagingDir)
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("tier")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got.size == want.size && got == want)
    assert(got.values.exists(_.isEmpty),
      "expected at least one event without a dimension row to survive")
    assert(got.values.exists(_.nonEmpty))
  }

  test("stream-stream interval join matches the batch join") {
    // clicks joined to purchases of the same user within [click, click+1h)
    val schema = spark.read.parquet(stagingDir).schema
    // the staged files are NOT time-ordered, so a short watermark would
    // (correctly) drop cross-batch late data; 60 days > the data's span
    // keeps all join state live while still exercising watermarked
    // stream-stream join mechanics across micro-batches
    def side(t: String) = EventStreams
      .readEvents(spark, stagingDir, schema)
      .filter(col("event_type") === t)
      .withWatermark("ts", "60 days")
    val clicks = side("click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    val purchases = side("purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
    val joined = clicks.join(purchases,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") < col("cts") + expr("INTERVAL 1 HOUR"))
    val q = joined.select("click_id", "purchase_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = spark.read.parquet(stagingDir)
    val bc = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
    val want = bc.join(bp,
        col("cu") === col("pu") &&
          col("pts") >= col("cts") &&
          col("pts") < col("cts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("clickAttribution emits exactly the batch view→click pairs") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    // 60-day horizon for the same reason as the inline join test above:
    // staged files are unordered, state must stay live across batches
    val q = EventStreams.clickAttribution(stream, horizon = "60 days")
      .select("view_id", "click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = spark.read.parquet(stagingDir)
    val bv = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"),
        col("event_id").as("view_id"))
    val bcl = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    val want = bv.join(bcl,
        col("vu") === col("cu") &&
          col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("outer clickAttribution emits unmatched views once the watermark passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-attr-outer").toFile.getAbsolutePath
    def writeBatch(sub: String,
        rows: Seq[(Long, String, Long, String)]): Unit =
      rows.map { case (id, ts, user, typ) =>
        (id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/$sub")
    // batch 1: user 1 converts (view 10:00 → click 10:10);
    //          user 2's view 10:05 never gets a click
    writeBatch("b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:10:00", 1L, "click"),
      (3L, "2024-01-01 10:05:00", 2L, "view")))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = EventStreams.clickAttributionOuter(stream, horizon = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer_out").start()
    q.processAllAvailable()
    val afterB1 = spark.table("attr_outer_out").collect()
      .map(r => (r.getLong(1), Option(r.get(2)))).toSet
    // the match may stream out immediately; "no click for view 3" is NOT
    // final yet — it must not have been emitted
    assert(!afterB1.contains((3L, None)), s"premature outer emit: $afterB1")
    // batch 2: far-future sentinel pushes the watermark past 10:05+30m+10m
    writeBatch("b2", Seq((9L, "2024-01-01 20:00:00", 99L, "view")))
    q.processAllAvailable()
    // one more empty-progress cycle lets the engine finalize state evictions
    writeBatch("b3", Seq((10L, "2024-01-01 21:00:00", 98L, "click")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_outer_out").collect()
      .map(r => (r.getLong(1), Option(r.get(2)))).toSet
    assert(got.contains((1L, Some(2L))), s"matched pair missing: $got")
    assert(got.contains((3L, None)), s"unmatched view not emitted: $got")
  }

  test("streaming dropDuplicates dedups across micro-batches") {
    // duplicate the staged events (same event_ids twice across files):
    // stateful dedup must converge to the distinct id count
    val dupDir = Files.createTempDirectory("graft-dup").toFile.getAbsolutePath
    val base = spark.read.parquet(stagingDir)
    base.unionByName(base).repartition(4)
      .write.mode("overwrite").parquet(dupDir)
    val stream = EventStreams.readEvents(spark, dupDir, base.schema)
    val q = stream
      .withWatermark("ts", "1 day")
      .dropDuplicates("event_id")
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out").collect()(0).getLong(0)
    val want = base.select("event_id").distinct().count()
    assert(got == want)
  }

  test("mapGroupsWithState keeps running per-user counts across micro-batches") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val q = EventStreams.runningUserState(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_state_out").start()
    q.processAllAvailable(); q.stop()
    // last emitted row per user carries the final running count
    val got = spark.table("user_state_out")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(stagingDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("flatMapGroupsWithState emits only strictly-increasing purchase maxima") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val q = EventStreams.purchaseAlerts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("alerts_out").start()
    q.processAllAvailable(); q.stop()
    val alerts = spark.table("alerts_out").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // the final (max) alert per user equals the batch per-user max purchase
    val gotMax = alerts.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
    val want = spark.read.parquet(stagingDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(max(col("value")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotMax == want)
    // within each user, emitted alerts never decrease in arrival order
    // (guaranteed by construction; checked per micro-batch semantics)
    assert(alerts.nonEmpty)
  }

  test("KMV aggregate runs under streaming state and converges to the batch sketch") {
    import graft.functions.KMinValues.kMinValues
    // the UDAF's serialize/deserialize path only runs when buffers cross
    // micro-batch boundaries through the state store — a pure batch test
    // never exercises it
    val schema = spark.read.parquet(stagingDir).schema
    val hv = (col("user_id") * 2654435761L + 12007L) % 2147483647L
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(kMinValues(hv, 16).as("kmv"))
    val q = sketch(EventStreams.readEvents(spark, stagingDir, schema))
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("kmv_stream").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = sketch(spark.read.parquet(stagingDir)).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("versioned sink commits one COW version per micro-batch; latest equals batch state") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val perUser = stream
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val path = Files.createTempDirectory("graft-vsink")
      .toFile.getAbsolutePath + "/t"
    val q = EventStreams.toVersionedSink(perUser, path, "user_id").start()
    q.awaitTermination()
    import graft.sources.VersionedTable
    val versions = VersionedTable.versions(spark, path)
    assert(versions.size >= 2, s"expected one version per micro-batch, got $versions")
    val got = VersionedTable.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(stagingDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // time travel: an earlier version holds counts <= the final state
    val v0 = VersionedTable.read(spark, path, versions.head).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v0.nonEmpty && v0.forall { case (u, n) => n <= want(u) })
    // post-crash replay of the last batch id must not mint a new version
    val lastTag = VersionedTable.tagOf(spark, path, versions.last)
    assert(lastTag.isDefined)
    EventStreams.mergeVersionedBatch(
      VersionedTable.read(spark, path), lastTag.get.toLong, path, "user_id")
    assert(VersionedTable.versions(spark, path) == versions,
      "replayed batch id minted a duplicate version")
  }

  test("foreachBatch KV sink folds micro-batches into one snapshot") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val perUser = stream
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val sink = new EventStreams.KvSink("user_id")
    val q = EventStreams.toKvSink(perUser, sink).start()
    q.awaitTermination()
    val snap = sink.snapshot.get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(stagingDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == want)
  }

  test("streaming dedup emits each re-delivered event exactly once") {
    import java.nio.file.Files
    // an at-least-once upstream: every event delivered twice, shuffled
    // across files so duplicates land in different micro-batches
    val dupDir = Files.createTempDirectory("graft-dup").toFile.getAbsolutePath
    val ev = spark.read.parquet(stagingDir)
    ev.union(ev).repartition(4).write.mode("overwrite").parquet(dupDir)
    val schema = spark.read.parquet(dupDir).schema
    val stream = EventStreams.readEvents(spark, dupDir, schema)
    // files are not time-ordered, so use a horizon wider than the data's
    // span — nothing is evicted mid-test and the dedup must be exact
    val q = EventStreams.dedupEvents(stream, horizon = "60 days")
      .select(col("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out").collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "emitted a duplicate event_id")
    val want = ev.select(col("event_id")).distinct().count()
    assert(got.length == want)
  }

  test("incremental funnel converges to the batch funnel PER USER across micro-batches") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val q = EventStreams.funnelStages(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    q.processAllAvailable(); q.stop()
    // latest emission per user = that user's final stage
    import org.apache.spark.sql.expressions.Window
    val got = spark.table("funnel_out")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // per-user batch recomputation (aggregate compares would let
    // compensating per-user errors cancel)
    val ev = spark.read.parquet(stagingDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("tc"))
      .select(col("user_id")).distinct()
    val s3 = p.collect().map(_.getLong(0)).toSet
    val s2 = c.select(col("user_id")).collect().map(_.getLong(0)).toSet
    val s1 = v.select(col("user_id")).collect().map(_.getLong(0)).toSet
    val want = ev.select(col("user_id")).distinct().collect()
      .map(_.getLong(0)).map { u =>
        u -> (if (s3(u)) 3 else if (s2(u)) 2 else if (s1(u)) 1 else 0)
      }.toMap
    assert(got.filter(_._2 > 0) == want.filter(_._2 > 0),
      s"diff: ${(got.toSet diff want.toSet).take(5)}")
  }

  test("funnel handles an out-of-order late view that re-validates an earlier click") {
    import java.nio.file.{Files => JFiles}
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    // user 7's click arrives in micro-batch 1, but the view that PRECEDES
    // it (event-time) only arrives in micro-batch 2 — the state machine
    // must re-validate the click and land on stage 2
    val dir = JFiles.createTempDirectory("graft-ooo").toFile.getAbsolutePath
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)],
        mtime: Long): Unit = {
      val f = s"$dir/$name"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(f)
      JFiles.walk(java.nio.file.Paths.get(f)).forEach(p =>
        JFiles.setLastModifiedTime(p, FileTime.fromMillis(mtime)))
    }
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    write("b1", Seq((1L, t(30), 7L, "click", 1.0, "{}")), 1000000L)
    write("b2", Seq((2L, t(10), 7L, "view", 1.0, "{}")), 2000000L)
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = EventStreams.funnelStages(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_ooo").start()
    q.processAllAvailable(); q.stop()
    import org.apache.spark.sql.expressions.Window
    val fin = spark.table("funnel_ooo")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fin(7L) == 2, s"late view must re-validate the click: $fin")
  }

  test("replay of a retained-away batch is skipped, never re-merged") {
    import java.nio.file.Files
    import graft.sources.VersionedTable
    import spark.implicits._
    val path = Files.createTempDirectory("graft-replay").toFile
      .getAbsolutePath + "/t"
    def batch(v: Double) = Seq((1L, v)).toDF("k", "v")
    (0L to 3L).foreach(i =>
      EventStreams.mergeVersionedBatch(batch(i.toDouble), i, path, "k"))
    assert(VersionedTable.versions(spark, path) == Seq(0, 1, 2, 3))
    assert(VersionedTable.retain(spark, path, keepLast = 2) == Seq(0, 1))
    // batch 0's tagged version is gone; its id is below every retained tag,
    // so it MUST still be treated as a replay — re-merging would overwrite
    // the newer value and mint a non-monotonic tag
    EventStreams.mergeVersionedBatch(batch(999.0), 0L, path, "k")
    assert(VersionedTable.versions(spark, path) == Seq(2, 3))
    assert(VersionedTable.read(spark, path)
      .collect().map(r => r.getDouble(1)).toSeq == Seq(3.0))
  }
  test("streaming per-day HLL state converges bit-identically to the " +
      "batch sketch") {
    val schema = spark.read.parquet(stagingDir).schema
    val stream = EventStreams.readEvents(spark, stagingDir, schema)
    val q = EventStreams.dailyHllState(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_out").start()
    q.processAllAvailable(); q.stop()
    // registers only grow under max-merge, so per day the CONVERGED
    // emission is (min n_zero, max est) — order-agnostic over however
    // the memory sink interleaved the micro-batch emissions
    val emitted = spark.table("hll_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = emitted.groupBy(_._1).map { case (d, rows) =>
      d -> ((rows.map(_._2).min, rows.map(_._3).max))
    }
    val want = Sketches.hllDaily(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }
}
