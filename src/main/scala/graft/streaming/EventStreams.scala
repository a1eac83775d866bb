package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.kv.KvOps

/** Structured Streaming surface (SURVEY.md §7.2 M4): the same window
  * expressions as [[graft.operators.Events]], run incrementally with
  * watermarks, plus a `foreachBatch` stateful sink that reuses the KV
  * upsert merge — the streaming home of the reference's epoch loop
  * (`/root/reference/src/database/ycsb/db.h:104-125` is a micro-batch
  * pattern; `foreachBatch` IS that pattern on Spark).
  *
  * Scale: file-source streaming partitions by arriving files;
  * watermark + windowed agg keeps state bounded to open windows only;
  * `maxFilesPerTrigger` bounds batch size. Nothing here holds driver-side
  * state beyond the query handle.
  */
object EventStreams {

  /** Session confs for a production-grade state store: the RocksDB provider
    * keeps streaming state off-heap with spill-to-disk (the in-memory
    * HDFS-backed default OOMs once keyed state outgrows the executor heap),
    * and changelog checkpointing uploads per-batch deltas instead of full
    * SST snapshots. Apply via `spark.conf.set` (or at session build) before
    * starting stateful queries; pair with `.option("checkpointLocation", …)`
    * on every production writer so offsets + state survive driver loss.
    */
  val rocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** File-based stream of the events table (schema must be supplied:
    * streaming sources don't infer).
    */
  def readEvents(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling 1-hour counts with a 2-hour watermark: late events beyond the
    * watermark are dropped, state for closed windows is evicted.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment: each streaming event joined against a
    * static (batch) dimension frame — the standard "decorate the stream
    * with reference data" pattern. The static side is broadcast, so every
    * micro-batch pays one hash-probe pass and the stream side never
    * shuffles; at 100 TB/day of events the dimension snapshot is the only
    * thing that moves. Left join: an event with no dimension row must
    * survive (it's a stream — dropping it silently loses data).
    */
  def enrichStatic(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Per-user session aggregation with watermark-bounded session state. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"))

  /** foreachBatch KV sink: each micro-batch's per-key aggregates are merged
    * into a mutable snapshot via last-writer-wins upsert — the streaming
    * equivalent of the Aria install phase (one version per micro-batch).
    * Returns the writer; caller starts/stops it. `latest` exposes the
    * current snapshot for assertions.
    */
  class KvSink(keyCol: String) extends Serializable {
    @volatile var snapshot: Option[DataFrame] = None
    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      // localCheckpoint (not persist): the batch DataFrame is only valid
      // during this call, and checkpointed snapshots need no manual
      // unpersist bookkeeping (persisting each batch leaked one cached
      // DataFrame per micro-batch)
      val compacted = batch.localCheckpoint(true)
      snapshot = Some(snapshot match {
        case None => compacted
        case Some(prev) =>
          KvOps.upsert(prev, compacted, keyCol).localCheckpoint(true)
      })
    }
  }

  /** Streaming exact deduplication — the ingest-side guard of the corpus
    * dedup pipeline (at-least-once upstreams re-deliver events; this drops
    * re-deliveries before they reach storage). State is one entry per key
    * seen within the watermark horizon and is evicted as event time
    * advances, so memory is bounded by arrival rate × watermark, NOT by
    * stream lifetime — the property that lets it run forever at 100 TB/day.
    * Exactness contract: duplicates arriving within the watermark of the
    * original are dropped; later re-deliveries are the upstream's problem
    * (same contract as Kafka idempotent producers' bounded window).
    */
  def dedupEvents(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (click attribution, unbounded twin of
    * [[graft.operators.Events.attribution]]): every view/click pair of the
    * same user with the click at most 30 minutes after the view. Both sides
    * carry a watermark and the join condition bounds click_ts to a window
    * around view_ts, which is exactly what Spark's state cleanup needs: a
    * buffered view can be dropped once the click watermark passes
    * view_ts + 30 min, so join state is bounded by arrival rate × horizon,
    * not stream lifetime. Emits ALL pairs in the window (append mode);
    * "most recent only" is a per-click aggregation downstream consumers
    * apply batch-side, where late data is settled.
    */
  def clickAttribution(events: DataFrame, horizon: String = "2 hours")
      : DataFrame = attributionJoin(events, horizon, "inner")

  /** Left-outer variant: additionally emits each view that saw NO click in
    * its 30-minute window, with null click columns — the "unconverted
    * impressions" feed. Emission of an unmatched view is necessarily
    * deferred until the click-side watermark passes view_ts + 30 min (only
    * then is "no click arrived" final); matched pairs stream out
    * immediately, same as the inner form.
    */
  def clickAttributionOuter(events: DataFrame, horizon: String = "2 hours")
      : DataFrame = attributionJoin(events, horizon, "left_outer")

  private def attributionJoin(events: DataFrame, horizon: String,
      joinType: String): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", horizon)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", horizon)
    views.join(clicks,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
        joinType)
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Custom per-key state via mapGroupsWithState: running event count +
    * last-seen timestamp per user, re-emitted on every micro-batch that
    * touches the key. This is the engine's arbitrary-stateful extension
    * point (the Spark home for reference-style per-key metadata like
    * rts/wts, kept across micro-batches instead of epochs).
    * State is bounded by the key cardinality; at scale use a timeout
    * (GroupStateTimeout) to evict idle keys.
    */
  case class UserState(n: Long, lastTsMicros: Long)
  case class UserAgg(user_id: Long, n_events: Long, last_ts_micros: Long)

  def runningUserState(events: DataFrame)
      : org.apache.spark.sql.Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var n = prev.n
          var last = prev.lastTsMicros
          it.foreach { case (_, ts) =>
            n += 1
            if (ts > last) last = ts
          }
          state.update(UserState(n, last))
          UserAgg(uid, n, last)
      }
  }

  /** SKETCH-VALUED streaming state: per-day HyperLogLog registers kept in
    * mapGroupsWithState, max-merged on every micro-batch — the streaming
    * twin of [[graft.operators.Sketches.hllDaily]] (same 64-register
    * layout, same avalanched hash, so the converged registers are
    * BIT-IDENTICAL to the batch operator's — asserted in
    * EventStreamsSpec). This is the production shape for "distinct users
    * per window" on an unbounded stream: state per key is a FIXED 64
    * bytes regardless of cardinality (a distinct-set would grow with
    * users), and max-merge is commutative + idempotent, so arrival order
    * and micro-batch boundaries cannot change the answer — replays and
    * out-of-order batches are safe by algebra, not by bookkeeping.
    *
    * At scale: keys (days) are bounded and old days stop receiving
    * events; a GroupStateTimeout would evict them after the retention
    * horizon. Emission is the estimate row (not the registers), so
    * downstream consumers see the same schema as the batch query.
    */
  case class HllState(regs: Array[Int])
  case class HllDay(day: String, n_zero: Long, est_hll: Long)

  def dailyHllState(events: DataFrame)
      : org.apache.spark.sql.Dataset[HllDay] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val M = 2147483647L
    events.select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[HllState, HllDay](GroupStateTimeout.NoTimeout) {
        (day, it, state) =>
          val regs = state.getOption.map(_.regs.clone())
            .getOrElse(Array.fill(64)(0))
          it.foreach { case (_, u) =>
            val y1raw = (2654435761L * u + 12007L) % M
            val y1 = y1raw ^ (y1raw >> 15)
            val hraw = (1779033703L * y1 + 514229L) % M
            val h = hraw ^ (hraw >> 13)
            val j = (h % 64L).toInt
            val w = h / 64L
            val rho =
              if (w == 0L) 26
              else 26 - java.lang.Long.toBinaryString(w).length
            if (rho > regs(j)) regs(j) = rho
          }
          state.update(HllState(regs))
          val nZero = regs.count(_ == 0).toLong
          val ssum = regs.map(m => math.pow(2.0, -m)).sum
          HllDay(day, nZero, math.floor(0.709 * 4096.0 / ssum).toLong)
      }
  }

  /** flatMapGroupsWithState variant: emits zero-or-more rows per group per
    * micro-batch — here, one row per NEW high-value purchase ("alert"
    * shape: state tracks the running per-user max; only increases emit).
    * The 0..n-output contract is what distinguishes it from
    * mapGroupsWithState's exactly-one.
    */
  case class MaxState(maxValue: Double)
  case class Alert(user_id: Long, value: Double)

  def purchaseAlerts(events: DataFrame)
      : org.apache.spark.sql.Dataset[Alert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MaxState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          var best = state.getOption.map(_.maxValue).getOrElse(Double.MinValue)
          val out = Seq.newBuilder[Alert]
          it.foreach { case (_, v) =>
            if (v > best) {
              best = v
              out += Alert(uid, v)
            }
          }
          state.update(MaxState(best))
          out.result().iterator
      }
  }

  /** Incremental funnel: per-user state machine over the event stream,
    * re-emitting the user's CURRENT funnel stage (0 none, 1 view, 2 click
    * after first view, 3 purchase after that click) on every micro-batch
    * that touches the user — the streaming form of
    * [[graft.operators.Events.funnel]]'s strict ordered semantics. State
    * keeps each user's raw stage timestamps so out-of-order arrival across
    * micro-batches converges to EXACTLY the batch answer (an
    * earlier-than-known view arriving late can re-validate an old click;
    * recomputing from the kept timestamps handles it; emissions carry a
    * seq so readers take each user's latest). At production scale the
    * per-user lists would be finalized and pruned at the watermark; kept
    * whole here to make streaming ≡ batch exact, which is what the test
    * pins.
    */
  case class FunnelState(views: List[Long], clicks: List[Long],
      purchases: List[Long], seq: Long)
  case class FunnelStage(user_id: Long, stage: Int, seq: Long)

  def funnelStages(events: DataFrame)
      : org.apache.spark.sql.Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelStage](
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val prev = state.getOption
          .getOrElse(FunnelState(Nil, Nil, Nil, 0L))
        var v = prev.views
        var c = prev.clicks
        var p = prev.purchases
        it.foreach {
          case (_, "view", ts) => v ::= ts
          case (_, "click", ts) => c ::= ts
          case (_, "purchase", ts) => p ::= ts
          case _ => ()
        }
        val next = FunnelState(v, c, p, prev.seq + 1)
        state.update(next)
        val tv = v.minOption
        val tc = tv.flatMap(t0 => c.filter(_ > t0).minOption)
        val tp = tc.flatMap(t1 => p.filter(_ > t1).minOption)
        val stage =
          if (tp.isDefined) 3 else if (tc.isDefined) 2
          else if (tv.isDefined) 1 else 0
        FunnelStage(uid, stage, next.seq)
      }
  }

  /** Wire an aggregated stream into a KvSink in update mode. */
  def toKvSink(agg: DataFrame, sink: KvSink): DataStreamWriter[org.apache.spark.sql.Row] =
    agg.writeStream
      .outputMode("update")
      .foreachBatch((batch: DataFrame, id: Long) => sink.merge(batch, id))
      .trigger(Trigger.AvailableNow())

  /** Durable form of the KV sink: each micro-batch's per-key updates commit
    * as one new [[graft.sources.VersionedTable]] COW version, so streaming
    * output is atomic on disk, survives the driver, and is time-travelable
    * to any micro-batch boundary. In update mode a running aggregate emits
    * each changed key with its full current value, so last-writer-wins
    * merge per version reconstructs the exact batch-mode state. Each
    * version is tagged with its batch id and a replayed batch (crash after
    * the version committed but before the streaming commit log recorded
    * it) is skipped, so with `.option("checkpointLocation", …)` the sink
    * is exactly-once INCLUDING the version history (one version per
    * processed batch, crash or not).
    *
    * Single-writer sink: the replay guard assumes the one-query-per-path
    * discipline of Spark's foreachBatch (which replays only un-logged
    * batches); concurrent writers to the same path are not coordinated
    * beyond AtomicDir's same-version commit race. The guard still covers an
    * out-of-order replay (e.g. a hand-rolled retry of an older batch), but
    * scans newest-first with early exit: this sink mints exactly one
    * version per processed batch with monotonically increasing batch ids,
    * so once a version's numeric tag drops below `batchId` no older version
    * can match — the common non-replay case reads ONE marker instead of
    * O(versions) per batch. [[graft.sources.VersionedTable.retain]] may
    * have dropped the old versions whose tags a very old replay would
    * match; a batch id BELOW every retained numeric tag is therefore also
    * treated as replayed (tags ascend, so it can only predate the retained
    * window) — never re-merged, which would overwrite newer values and
    * break the monotonic-tag invariant for every later replay.
    */
  def mergeVersionedBatch(batch: DataFrame, batchId: Long, path: String,
      keyCol: String): Unit = {
    val sp = batch.sparkSession
    import graft.sources.VersionedTable
    val versions = VersionedTable.versions(sp, path)
    val replayed = {
      var found = false
      var stop = false
      var minNumericTag = Long.MaxValue
      val it = versions.reverseIterator // versions() is ascending
      while (!stop && it.hasNext) {
        VersionedTable.tagOf(sp, path, it.next()) match {
          case Some(t) if t == batchId.toString => found = true; stop = true
          case Some(t) =>
            scala.util.Try(t.toLong).toOption match {
              case Some(n) if n < batchId =>
                stop = true // tags ascend; nothing older can match
              case Some(n) => minNumericTag = math.min(minNumericTag, n)
              case None => () // foreign tag: keep scanning
            }
          case None => () // untagged version: keep scanning
        }
      }
      // exhausted without a match, and every retained tag is newer than
      // batchId: the matching version was retained away — still a replay
      found || (!stop && minNumericTag != Long.MaxValue &&
        minNumericTag > batchId)
    }
    if (!replayed) {
      if (versions.isEmpty) {
        VersionedTable.init(batch, path, Some(batchId.toString))
      } else {
        VersionedTable.merge(sp, path, batch, keyCol, Some(batchId.toString))
      }
    }
    ()
  }

  def toVersionedSink(agg: DataFrame, path: String, keyCol: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    agg.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeVersionedBatch(batch, id, path, keyCol)
      }
      .trigger(Trigger.AvailableNow())
}
