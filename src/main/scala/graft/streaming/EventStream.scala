package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.LongType

/** Structured-Streaming versions of the event-pipeline operators: the
  * same logic as [[graft.events.EventOps]] run incrementally with
  * watermarked state. Each transform takes a (possibly streaming)
  * DataFrame with the `events` schema (ts as int64 nanoseconds) so batch
  * and stream share one code path — the test harness asserts
  * batch ≡ stream(AvailableNow) equivalence.
  *
  * At scale: state is keyed (event_type / user_id), so it partitions
  * across executors with the shuffle; watermarks bound state size; no
  * driver-side state anywhere.
  */
object EventStream {

  /** int64-ns `ts` → proper event-time column (micros precision).
    * Type-adaptive like the batch side: a source whose `ts` arrives as a
    * timestamp type (testdata drift, see [[graft.events.EventOps.normalizeTs]])
    * is normalized to int64 ns first, so batch and stream keep one
    * contract. */
  def withEventTime(events: DataFrame): DataFrame =
    graft.events.EventOps.normalizeTs(events)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Incremental hourly rollup per event type: tumbling window + count
    * and exact integer-cent sum; watermark bounds the open-window state. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("cents"))

  /** Session windows per user (gap-based), the streaming analog of
    * [[graft.events.EventOps.sessionize]]. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"), col("cents"))

  /** Streaming exact dedup: keep the first record per key across
    * micro-batches — the online twin of the batch exact-dedup operator.
    * `keyCols` is typically a content fingerprint like md5(text).
    *
    * Without an event-time column the state is unbounded (exact global
    * dedup via stateful `dropDuplicates`). With one, we use
    * `dropDuplicatesWithinWatermark(keyCols)`: dedup is on the KEY ALONE
    * (two records with the same fingerprint but different timestamps
    * collapse to the first), and key state expires once the watermark
    * passes the first-seen event time, bounding memory — duplicates are
    * guaranteed dropped when they arrive within the watermark delay of
    * each other, which is the contract a streaming ingest dedup needs. */
  def streamingDedup(records: DataFrame, keyCols: Seq[String],
      eventTimeCol: Option[String] = None, watermark: String = "2 hours"): DataFrame =
    eventTimeCol match {
      case Some(t) => records.withWatermark(t, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
      case None => records.dropDuplicates(keyCols)
    }

  /** Stream-stream interval join: attribute each purchase to the clicks
    * of the same user within the preceding `horizon`. Both sides carry a
    * watermark and the join condition bounds event-time distance, so the
    * state store retains only `horizon + watermark` of each stream —
    * bounded state at any scale, keyed (shuffled) by user_id. Works
    * identically on batch DataFrames (batch ≡ stream spec). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = withEventTime(clicks).withWatermark("event_time", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
    val p = withEventTime(purchases).withWatermark("event_time", watermark)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_time").as("purchase_time"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_time"), col("purchase_time"))
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count + cents total, emitted once per micro-batch — the shape used
    * for feature backfills and online counters. */
  final case class UserTotals(user_id: Long, n_events: Long, cents: Long)

  /** Streaming twin of [[graft.events.GraphOps.transitions]]' sequence
    * step: per-user adjacent event-type transitions across micro-batch
    * boundaries via flatMapGroupsWithState. State per user is ONLY the
    * last seen event (ts, event_id, type) — O(users) state, no event
    * buffering. Within a batch the group's rows sort by (ts, event_id)
    * like the batch window; ACROSS batches the log-replay contract
    * applies (a user's events do not time-travel between batches —
    * the same in-order ingest assumption the sessionizer makes).
    * Downstream, the emitted transitions feed the same bounded
    * (src, dst) count aggregation as the batch path. */
  final case class Transition(user_id: Long, src: String, dst: String)
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  def streamingTransitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.events.EventOps.normalizeTs(events)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[LastEvent]) =>
          // µs-order like the batch window (ns div 1000, event_id) so
          // batch ≡ stream holds on same-µs pairs too
          val batch = rows.toSeq.sortBy(r => (r._2 / 1000, r._3))
            .map(r => (r._2, r._3, r._4))
          val seq = state.getOption
            .map(p => (p.ts, p.event_id, p.event_type)).toSeq ++ batch
          seq.lastOption.foreach { last =>
            state.update(LastEvent(last._1, last._2, last._3))
          }
          seq.sliding(2).collect { case Seq(a, b) => Transition(uid, a._3, b._3) }
      }
  }

  /** Streaming twin of [[graft.events.EventOps.attribution]]'s
    * per-purchase credit step: each purchase is attributed to its
    * user's most recent preceding touch via flatMapGroupsWithState.
    * State per user is ONLY the last touch (ts, event_id, channel) —
    * O(users) state, no event buffering; within a batch rows sort by
    * (µs, event_id) like the batch window, across batches the same
    * in-order log-replay contract as [[streamingTransitions]].
    * Downstream the emitted rows feed the identical bounded
    * per-channel aggregation as the batch path. NULL purchase values
    * emit 0 cents, matching the batch sum() which skips NULLs. */
  final case class Attributed(user_id: Long, purchase_id: Long,
      channel: String, cents: Long)
  final case class LastTouch(ts: Long, event_id: Long, channel: String)

  def streamingAttribution(events: DataFrame): Dataset[Attributed] = {
    val spark = events.sparkSession
    import spark.implicits._
    val touches = graft.events.EventOps.AttributionTouches.toSet
    graft.events.EventOps.normalizeTs(events)
      .filter(col("event_type")
        .isin(graft.events.EventOps.AttributionTouches :+ "purchase": _*))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        coalesce(round(col("value") * 100).cast(LongType), lit(0L)).as("cents"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastTouch, Attributed](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[LastTouch]) =>
          val batch = rows.toSeq.sortBy(r => (r._2 / 1000, r._3))
          var lt = state.getOption
          val out = Seq.newBuilder[Attributed]
          batch.foreach { r =>
            if (touches.contains(r._4)) lt = Some(LastTouch(r._2, r._3, r._4))
            else out += Attributed(uid, r._3,
              lt.map(_.channel).getOrElse("direct"), r._5)
          }
          lt.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of [[graft.events.EventOps.funnel]]: emit each
    * user's click→purchase conversion the moment the FIRST purchase
    * strictly after their FIRST click arrives. State per user is two
    * optional µs timestamps — O(users), no buffering; under the
    * in-order replay contract the first click seen IS min(click_us)
    * and the first qualifying purchase IS min(p_us), so the appended
    * conversions equal the batch report row-for-row. A user emits at
    * most once (the `converted` flag); same-µs click+purchase does not
    * convert (strict `>`, the batch rule). */
  final case class Conversion(user_id: Long, click_us: Long,
      purch_us: Long, delay_us: Long)
  final case class FunnelState(firstClickUs: Long, converted: Boolean)

  def streamingFunnel(events: DataFrame): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.events.EventOps.normalizeTs(events)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, Conversion](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val batch = rows.toSeq.sortBy(r => (r._2 / 1000, r._3))
          var st = state.getOption.getOrElse(FunnelState(Long.MinValue, false))
          val out = Seq.newBuilder[Conversion]
          batch.foreach { r =>
            val us = r._2 / 1000
            if (r._4 == "click") {
              if (st.firstClickUs == Long.MinValue) st = st.copy(firstClickUs = us)
            } else if (!st.converted && st.firstClickUs != Long.MinValue &&
                us > st.firstClickUs) {
              st = st.copy(converted = true)
              out += Conversion(uid, st.firstClickUs, us, us - st.firstClickUs)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of [[graft.events.EventOps.retention]]'s per-user
    * substrate: cohort day (first day seen — under in-order replay the
    * first event IS the minimum) plus the d1/d7 activity flags,
    * re-emitted whenever a flag flips (Update semantics). State per
    * user is one tiny row — O(users), no day-set buffering. The LAST
    * emitted row per user aggregates to exactly the batch cohort
    * report (count / count-if(d1) / count-if(d7) per cohort_day). */
  final case class UserRetention(user_id: Long, cohort_day: Long,
      d1: Boolean, d7: Boolean)

  def streamingRetention(events: DataFrame): Dataset[UserRetention] = {
    val spark = events.sparkSession
    import spark.implicits._
    val usPerDay = graft.events.EventOps.UsPerDay
    graft.events.EventOps.normalizeTs(events)
      .select(col("user_id"), expr(s"(ts div 1000) div $usPerDay").as("day"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRetention, UserRetention](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserRetention]) =>
          val days = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(
            UserRetention(uid, days.head, d1 = false, d7 = false))
          val before = state.getOption
          days.foreach { d =>
            if (d == st.cohort_day + 1) st = st.copy(d1 = true)
            if (d == st.cohort_day + 7) st = st.copy(d7 = true)
          }
          state.update(st)
          if (before.contains(st)) Iterator.empty else Iterator.single(st)
      }
  }

  /** Streaming twin of [[graft.events.EventOps.pitFeatures]] — ONLINE
    * point-in-time feature serving: each purchase label emits the
    * user's feature row computed from state BEFORE the label event is
    * folded in, which is exactly the batch side's
    * `UNBOUNDED PRECEDING .. 1 PRECEDING` frame (leakage-safe by
    * construction: emit-then-update). State per user is three longs
    * (running event count, view count, last observed cents) — O(users),
    * no event buffering; within a batch rows sort by (µs, event_id)
    * like the batch window, across batches the in-order log-replay
    * contract of [[streamingTransitions]] applies. A NULL purchase
    * value rides as a Long.MinValue sentinel (the tuple encoder cannot
    * carry null) and leaves last_cents untouched, matching the batch
    * `last(..., ignoreNulls)`. */
  final case class PitFeatureRow(user_id: Long, event_id: Long, ts_us: Long,
      feat_events: Long, feat_views: Long, last_cents: Long)
  final case class PitState(nEvents: Long, nViews: Long, lastCents: Long)

  def streamingPitFeatures(events: DataFrame): Dataset[PitFeatureRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.events.EventOps.normalizeTs(events)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        coalesce(round(col("value") * 100).cast(LongType),
          lit(Long.MinValue)).as("cents"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PitState, PitFeatureRow](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[PitState]) =>
          val batch = rows.toSeq.sortBy(r => (r._2 / 1000, r._3))
          var st = state.getOption.getOrElse(PitState(0L, 0L, -1L))
          val out = Seq.newBuilder[PitFeatureRow]
          batch.foreach { r =>
            if (r._4 == "purchase")
              out += PitFeatureRow(uid, r._3, r._2 / 1000,
                st.nEvents, st.nViews, st.lastCents)
            st = PitState(st.nEvents + 1,
              st.nViews + (if (r._4 == "view") 1L else 0L),
              if (r._5 != Long.MinValue) r._5 else st.lastCents)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming Misra-Gries pass 1: per-type heavy-user CANDIDATE
    * sketches maintained incrementally by the engine's streaming
    * aggregation state — the native
    * [[graft.functions.MgSketchAgg]] buffer lives in the state store
    * and each micro-batch's partials merge into it, so the final
    * sketch is a merge of per-batch sketches in arrival order.
    * Mergeable-summaries guarantee (`MgSketchAggSpec`): ANY merge
    * order yields a candidate superset of the true over-threshold
    * keys, so the streaming candidates feed the same exact pass 2 as
    * the batch plan ([[graft.events.EventOps.heavyUsers]]). State per
    * (type) is ≤cap counters — bounded regardless of user cardinality
    * or stream length. Update output mode: each batch re-emits the
    * types it touched. */
  def typeHeavyCandidates(events: DataFrame, cap: Int): DataFrame = {
    graft.functions.MgSketchAgg.register(events.sparkSession)
    events.select(col("event_type"), col("user_id").cast("string").as("u"))
      .groupBy("event_type")
      .agg(call_function("mg_sketch", col("u"), lit(cap)).as("sk"))
      .select(col("event_type"), col("sk.n").as("n"),
        col("sk.terms").as("terms"))
  }

  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // coalesce: a NULL value would kill the tuple encoder mid-stream,
      // while the batch twin's sum() silently skips it — 0 cents matches
      .select(col("user_id"),
        coalesce(round(col("value") * 100).cast(LongType), lit(0L)).as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0L))
          var n = prev.n_events
          var c = prev.cents
          rows.foreach { r => n += 1; c += r._2 }
          val next = UserTotals(uid, n, c)
          state.update(next)
          next
      }
  }
}
