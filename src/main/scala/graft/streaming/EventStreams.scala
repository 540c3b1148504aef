package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` shape
  * `(event_id, ts, user_id, event_type, value, props)`.
  *
  * The reference engine has no streaming (SURVEY.md §2.5); these are the
  * Spark-native streaming capabilities the engine exposes: event-time
  * windowed aggregation with watermarks, and custom session state via
  * flatMapGroupsWithState. Inputs are any streaming DataFrame with the
  * events schema (tests drive them with MemoryStream; production would use
  * a Kafka/file `readStream`).
  */
object EventStreams {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class SessionUpdate(
      user_id: Long,
      session_start: Timestamp,
      n_events: Long,
      total_value: Double,
      closed: Boolean)

  final case class SessionState(
      start: Long,
      lastSeen: Long,
      n: Long,
      total: Double)

  /** Tumbling-window counts/sums per event type with a watermark: late data
    * beyond the watermark is dropped, state is bounded — the requirement for
    * unbounded-stream execution. */
  def windowedCounts(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Session windows via native session_window (gap-based). */
  def sessionWindows(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Custom session state with flatMapGroupsWithState: emits one update per
    * batch per active session and a final `closed` record on gap timeout —
    * the shape used when session output must be richer than an aggregate. */
  def statefulSessions(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, new Timestamp(s.start),
              s.n, s.total, closed = true))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              var cur = prev.getOrElse(SessionState(
                sorted.head.ts.getTime, sorted.head.ts.getTime, 0L, 0.0))
              val out = Vector.newBuilder[SessionUpdate]
              sorted.foreach { e =>
                val t = e.ts.getTime
                if (t - cur.lastSeen > gapMs && cur.n > 0) {
                  out += SessionUpdate(userId, new Timestamp(cur.start),
                    cur.n, cur.total, closed = true)
                  cur = SessionState(t, t, 0L, 0.0)
                }
                cur = SessionState(cur.start, t, cur.n + 1, cur.total + e.value)
              }
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastSeen + gapMs)
              out += SessionUpdate(userId, new Timestamp(cur.start),
                cur.n, cur.total, closed = false)
              out.result().iterator
            }
          }
      }
  }

  final case class AsofEnriched(
      event_id: Long,
      user_id: Long,
      ts: Timestamp,
      click_id: Option[Long],
      gap_ms: Option[Long])

  final case class LatestClick(tsMs: Long, id: Long)

  /** Streaming as-of enrichment — the streaming counterpart of
    * [[graft.ops.TemporalOps.asofJoin]]: each `purchase` event is enriched
    * with the user's latest `click` at-or-before it. State per user is ONE
    * tiny (ts, id) record (not a window buffer), expired by event-time
    * timeout when a user goes idle past the horizon — bounded state on an
    * unbounded stream.
    *
    * Within a micro-batch events are processed in (ts, type, id) order
    * with clicks before purchases at equal timestamps, matching the batch
    * operator's backward-inclusive semantics. Across batches the
    * enrichment is per-arrival-order: a click that ARRIVES after a
    * purchase was already emitted does not retro-match it (streams emit
    * once) — the standard streaming relaxation of the batch join.
    */
  def streamingAsof(events: Dataset[Event],
      horizonMs: Long = 2 * 3600 * 1000L): Dataset[AsofEnriched] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .withWatermark("ts", s"$horizonMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestClick, AsofEnriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[LatestClick]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // clicks sort before purchases at equal ts (backward INCLUSIVE)
            val sorted = evs.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.event_type == "click") 0 else 1, e.event_id))
            var latest = state.getOption
            var maxTs = Long.MinValue
            val out = Vector.newBuilder[AsofEnriched]
            sorted.foreach { e =>
              val t = e.ts.getTime
              maxTs = math.max(maxTs, t)
              e.event_type match {
                case "click" =>
                  // ties on ts resolve to the largest id — same rule the
                  // batch operator's pre-reduce (max event_id) applies
                  if (latest.forall(c =>
                      t > c.tsMs || (t == c.tsMs && e.event_id > c.id)))
                    latest = Some(LatestClick(t, e.event_id))
                case "purchase" =>
                  // backward-INCLUSIVE guard: a late-arriving purchase must
                  // not match a click from its future (state can hold a
                  // click newer than an out-of-order purchase)
                  val eligible = latest.filter(_.tsMs <= t)
                  out += AsofEnriched(e.event_id, userId, e.ts,
                    eligible.map(_.id), eligible.map(c => t - c.tsMs))
                case _ => ()
              }
            }
            latest.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(math.max(maxTs, c.tsMs) + horizonMs)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming triple extraction: pages stream → triples stream. Stateless
    * row-local transform — watermark-free, scales with input partitions. */
  def streamingTriples(pages: Dataset[graft.kg.Model.Page]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(graft.kg.TripleExtraction.triplesForPage _).toDF()
  }

  /** Streaming exact dedup for a document stream `(doc_id, ts, text)`:
    * keeps the FIRST document per content fingerprint inside the watermark
    * horizon. dropDuplicatesWithinWatermark bounds the dedup state by the
    * watermark (an unbounded-stream requirement — a plain dropDuplicates
    * would accumulate one state row per distinct document forever); the
    * fingerprint column keeps state rows at 32 bytes instead of full texts.
    * The training-data shape: continuous crawl ingestion where re-fetched
    * boilerplate must not re-enter the corpus. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // working column — callers get the input schema back

  /** Windowed count-min frequency sketch of user ids: the streaming form
    * of [[graft.ops.SketchOps.countMinTable]]. Per-key streaming counts
    * hold one state row per distinct key per window (unbounded in the key
    * domain); the sketch caps state at depth×width counters per window,
    * mergeable across micro-batches by plain addition (counts are
    * associative — streamed counters equal the batch table, tested).
    * Point-query downstream with [[graft.ops.SketchOps.cmsEstimate]]. */
  def windowedFrequencySketch(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours",
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val rows = (0 until depth).map { d =>
      struct(lit(d.toLong).as("d"),
        pmod(xxhash64(lit(d.toLong), col("user_id")), lit(width.toLong)).as("b"))
    }
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(array(rows: _*)).as("e"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("e.d").as("depth"), col("e.b").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Windowed distinct-user HLL sketch per event type: the streaming form
    * of [[graft.ops.SketchOps.hllRegisters]]. A streaming COUNT DISTINCT
    * would hold one state row per distinct key per window — unbounded in
    * the key domain; the HLL buffer caps state at 2^p ints per
    * (window, event_type) group no matter how many users flow through,
    * and because the aggregator is mergeable the state-store update is an
    * element-wise max, exact across micro-batch boundaries (registers
    * after any batch split equal the batch computation — tested). Emits
    * the register array; estimate with [[graft.ops.SketchOps.hllEstimate]]
    * downstream. */
  def windowedDistinctSketch(events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours",
      p: Int = 12): DataFrame = {
    val sketch = org.apache.spark.sql.functions.udaf(
      new graft.ops.SketchOps.HllAggregator(p),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"), xxhash64(col("user_id")).as("h"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(sketch(col("h")).as("regs"))
  }
}
