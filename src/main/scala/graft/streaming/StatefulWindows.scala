package graft.streaming

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.api.GraftAggregation

/** Custom stateful range windows with the reference's late-data policies
  * (/root/reference/lib/wallaroo/core/windows/late_data_policy.pony and
  * windows.pony RangeWindowsBuilder.with_delay): per-key open windows are
  * kept in the state store, the watermark is the stream's max event time
  * minus `delayS`, windows whose end falls behind the watermark close and
  * emit, and late rows are handled per policy:
  *
  *  - [[LatePolicy.Drop]]            — discard (the built-in watermark
  *                                     behavior)
  *  - [[LatePolicy.FirePerMessage]]  — immediately emit a singleton output
  *                                     for the late row's window
  *  - [[LatePolicy.PlaceInOldest]]   — fold the row into the oldest still
  *                                     -open window
  *
  * Built on flatMapGroupsWithState with `EventTimeTimeout`: windows flush
  * when the QUERY watermark passes their end even if the key receives no
  * further input — the reference's `on_timeout`/`flush_windows` path
  * (windows.pony:122-125). A key that goes quiet still emits its windows
  * as other keys advance the watermark.
  *
  * Watermark plumbing: Spark's `flatMapGroupsWithState` + `EventTimeTimeout`
  * drops input rows older than the query watermark BEFORE the user
  * function sees them, which would hide exactly the rows the late-data
  * policies exist for. So the declared Spark watermark is
  * `delayS + admitLateS`: rows up to `admitLateS` behind the semantic
  * watermark still reach the policy logic, and the in-function watermark is
  * re-shifted (`+ admitLateS`) back to the reference's `max event time −
  * delayS`. `admitLateS` is the admission horizon — rows later than that
  * are dropped by the engine itself (the unavoidable price of bounded
  * state at scale; the reference keeps no such bound because it keeps no
  * such guarantee).
  */
object StatefulWindows {

  sealed trait LatePolicy extends Serializable
  object LatePolicy {
    case object Drop extends LatePolicy
    case object FirePerMessage extends LatePolicy
    case object PlaceInOldest extends LatePolicy
  }

  /** Marks the event-time column and declares the widened watermark. */
  private def withEventTime[In](ds: Dataset[In], tsCol: String,
      delayS: Long, admitLateS: Long)(implicit enc: Encoder[In]): Dataset[In] =
    if (!ds.isStreaming) ds
    else ds.withColumn("_graft_ets", timestamp_seconds(col(tsCol)))
      .withWatermark("_graft_ets", s"${delayS + admitLateS} seconds")
      .as[In]

  /** Spark watermark (ms) → semantic watermark in epoch seconds
    * (max event ts − delayS), or Long.MinValue while unset.
    */
  private def semanticWm(wmMs: Long, admitLateS: Long): Long =
    if (wmMs <= 0L) Long.MinValue
    else math.floorDiv(wmMs, 1000L) + admitLateS

  /** Next event-time timeout: fire when the Spark watermark passes
    * `dueSec − admitLateS` (i.e. the semantic watermark passes `dueSec`);
    * clamped to stay positive and strictly above the current watermark —
    * a clamped (early) wakeup just re-evaluates and re-arms.
    */
  private def armTimeout(gs: GroupState[_], dueSec: Long, admitLateS: Long,
      wmMs: Long): Unit = {
    val desired = (dueSec - admitLateS) * 1000L - 1L
    gs.setTimeoutTimestamp(math.max(desired, math.max(wmMs + 1L, 1L)))
  }

  /** Emitted row: (key, windowStart, output). `tsCol` names the
    * epoch-seconds column `tsSec` reads, so the stream can carry a real
    * watermark.
    */
  def rangeWindows[In, K: Encoder, Acc, Out](
      ds: Dataset[In], keyFn: In => K, tsSec: In => Long, tsCol: String,
      rangeS: Long, delayS: Long, policy: LatePolicy,
      agg: GraftAggregation[In, Acc, Out], admitLateS: Long = 3600L)(
      implicit inEnc: Encoder[In],
      outEnc: Encoder[(K, Long, Out)]): Dataset[(K, Long, Out)] = {
    implicit val stateEnc: Encoder[Map[Long, Acc]] = Encoders.kryo[Map[Long, Acc]]
    withEventTime(ds, tsCol, delayS, admitLateS)
      .groupByKey(keyFn)
      .flatMapGroupsWithState[Map[Long, Acc], (K, Long, Out)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: K, rows: Iterator[In], gs: GroupState[Map[Long, Acc]]) =>
          val wmMs = gs.getCurrentWatermarkMs
          val wm = semanticWm(wmMs, admitLateS)
          var open = gs.getOption.getOrElse(Map.empty[Long, Acc])
          val out = ArrayBuffer.empty[(K, Long, Out)]
          if (!gs.hasTimedOut) rows.toSeq.sortBy(tsSec).foreach { in =>
            val t = tsSec(in)
            val wStart = math.floorDiv(t, rangeS) * rangeS
            val isLate = t < wm && !open.contains(wStart)
            if (!isLate)
              open = open.updated(wStart,
                agg.update(in, open.getOrElse(wStart, agg.initialAccumulator)))
            else policy match {
              case LatePolicy.Drop => ()
              case LatePolicy.FirePerMessage =>
                out += ((k, wStart, agg.output(agg.update(in, agg.initialAccumulator))))
              case LatePolicy.PlaceInOldest =>
                val oldest =
                  if (open.nonEmpty) open.keysIterator.min else wStart
                open = open.updated(oldest,
                  agg.update(in, open.getOrElse(oldest, agg.initialAccumulator)))
            }
          }
          // flush every window the watermark has passed (reference
          // windows.pony `on_timeout` → `flush_windows`)
          val (closed, still) = open.partition { case (w, _) => w + rangeS <= wm }
          closed.toSeq.sortBy(_._1).foreach { case (w, acc) =>
            out += ((k, w, agg.output(acc)))
          }
          if (still.isEmpty) gs.remove()
          else {
            gs.update(still)
            armTimeout(gs, still.keysIterator.min + rangeS, admitLateS, wmMs)
          }
          out.iterator
      }
  }

  case class EphemeralState[Acc](startTs: Long, maxTs: Long,
      triggered: Boolean, acc: Acc)

  /** Ephemeral (trigger) windows — faithful to the reference
    * (/root/reference/lib/wallaroo/core/windows/ephemeral_window.pony:66-140):
    * a key's first event opens a window anchored at that event's watermark
    * (`first ts − delayS`, ephemeral_window.pony:100-104
    * `_starting_watermark_ts`); the aggregate fires once the watermark
    * STRICTLY passes `trigger point = anchor + triggerS`
    * (`watermark_ts > _trigger_point`, :137); between trigger and `remove
    * point = trigger + postTriggerS`, late rows follow the policy (Drop or
    * FirePerMessage — PlaceInOldest is invalid for ephemeral windows, as in
    * the reference); once the watermark reaches the remove point the state
    * expires (`retain_state = watermark_ts < _remove_point`, :110) and the
    * next event opens a fresh window. The watermark is the max of the
    * query watermark (flushes quiet keys via event-time timeout) and the
    * key's own max event ts − delayS (in-batch responsiveness). Emits
    * (key, windowStartTs, output).
    */
  def ephemeralWindows[In, K: Encoder, Acc, Out](
      ds: Dataset[In], keyFn: In => K, tsSec: In => Long, tsCol: String,
      triggerS: Long, postTriggerS: Long, delayS: Long, policy: LatePolicy,
      agg: GraftAggregation[In, Acc, Out], admitLateS: Long = 3600L)(
      implicit inEnc: Encoder[In],
      outEnc: Encoder[(K, Long, Out)]): Dataset[(K, Long, Out)] = {
    require(policy != LatePolicy.PlaceInOldest,
      "'Place in oldest window' is not a valid late data policy for ephemeral windows")
    implicit val stateEnc: Encoder[Option[EphemeralState[Acc]]] =
      Encoders.kryo[Option[EphemeralState[Acc]]]
    withEventTime(ds, tsCol, delayS, admitLateS)
      .groupByKey(keyFn)
      .flatMapGroupsWithState[Option[EphemeralState[Acc]], (K, Long, Out)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: K, rows: Iterator[In], gs: GroupState[Option[EphemeralState[Acc]]]) =>
          val wmMs = gs.getCurrentWatermarkMs
          val globalWm = semanticWm(wmMs, admitLateS)
          var st: Option[EphemeralState[Acc]] = gs.getOption.flatten
          val out = ArrayBuffer.empty[(K, Long, Out)]
          def triggerPoint(s: EphemeralState[Acc]) = s.startTs - delayS + triggerS
          def removePoint(s: EphemeralState[Acc]) = triggerPoint(s) + postTriggerS
          def effWm(s: EphemeralState[Acc]) =
            math.max(globalWm, s.maxTs - delayS)
          def tryTrigger(): Unit = st.foreach { s =>
            if (!s.triggered && effWm(s) > triggerPoint(s)) {
              out += ((k, s.startTs, agg.output(s.acc)))
              st = Some(s.copy(triggered = true))
            }
          }
          def tryExpire(extraWm: Long): Unit = st.foreach { s =>
            val wm = math.max(effWm(s), extraWm)
            if (wm >= removePoint(s)) {
              if (!s.triggered && wm > triggerPoint(s))
                out += ((k, s.startTs, agg.output(s.acc)))
              st = None
            }
          }
          if (!gs.hasTimedOut) rows.toSeq.sortBy(tsSec).foreach { in =>
            val t = tsSec(in)
            // the incoming event advances the key watermark: if it passes an
            // open window's remove point, trigger-if-pending then expire
            // (reference: "arrives after the window was removed → treat as
            // first message", ephemeral_window.pony:70-74)
            tryExpire(t - delayS)
            st match {
              case None =>
                st = Some(EphemeralState(t, t, triggered = false,
                  agg.update(in, agg.initialAccumulator)))
              case Some(s) if !s.triggered =>
                st = Some(s.copy(maxTs = math.max(s.maxTs, t),
                  acc = agg.update(in, s.acc)))
              case Some(s) => // triggered, in post-trigger phase
                policy match {
                  case LatePolicy.Drop => ()
                  case LatePolicy.FirePerMessage =>
                    out += ((k, s.startTs,
                      agg.output(agg.update(in, agg.initialAccumulator))))
                  case LatePolicy.PlaceInOldest => ()
                }
                st = Some(s.copy(maxTs = math.max(s.maxTs, t)))
            }
            tryTrigger()
          }
          // watermark-driven flush for quiet keys (reference on_timeout)
          tryTrigger()
          tryExpire(Long.MinValue)
          st match {
            case None => gs.remove()
            case Some(s) =>
              gs.update(Some(s))
              val due = if (!s.triggered) triggerPoint(s) + 1 else removePoint(s)
              armTimeout(gs, due, admitLateS, wmMs)
          }
          out.iterator
      }
  }

  /** Tumbling count windows per key across micro-batches (reference
    * CountWindowsBuilder, windows.pony:105): emit an aggregate every
    * `count` rows; the partial window rides in state between batches.
    * Count windows close on row count, not time — no watermark timeout.
    */
  def countWindows[In, K: Encoder, Acc, Out](
      ds: Dataset[In], keyFn: In => K, orderBy: In => Long, count: Int,
      agg: GraftAggregation[In, Acc, Out])(
      implicit outEnc: Encoder[(K, Long, Out)]): Dataset[(K, Long, Out)] = {
    // state: (windowId, rowsInWindow, acc)
    implicit val stateEnc: Encoder[(Long, Int, Acc)] = Encoders.kryo[(Long, Int, Acc)]
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[(Long, Int, Acc), (K, Long, Out)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[In], gs: GroupState[(Long, Int, Acc)]) =>
          var (win, n, acc) = gs.getOption.getOrElse((0L, 0, agg.initialAccumulator))
          val out = ArrayBuffer.empty[(K, Long, Out)]
          rows.toSeq.sortBy(orderBy).foreach { in =>
            acc = agg.update(in, acc)
            n += 1
            if (n == count) {
              out += ((k, win, agg.output(acc)))
              win += 1; n = 0; acc = agg.initialAccumulator
            }
          }
          gs.update((win, n, acc))
          out.iterator
      }
  }
}
