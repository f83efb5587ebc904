package graft.streaming

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.api.GraftAggregation

/** Custom stateful range windows with the reference's late-data policies
  * (/root/reference/lib/wallaroo/core/windows/late_data_policy.pony and
  * windows.pony RangeWindowsBuilder.with_delay): per-key open windows are
  * kept in the state store, the watermark is each key's max event time
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
  * Built on flatMapGroupsWithState (the standard extension point when
  * `window()` semantics don't fit), with Spark checkpointing the state.
  */
object StatefulWindows {

  sealed trait LatePolicy extends Serializable
  object LatePolicy {
    case object Drop extends LatePolicy
    case object FirePerMessage extends LatePolicy
    case object PlaceInOldest extends LatePolicy
  }

  case class WindowState[Acc](maxTs: Long, open: Map[Long, Acc])

  /** Emitted row: (key, windowStart, output). */
  def rangeWindows[In, K: Encoder, Acc, Out](
      ds: Dataset[In], keyFn: In => K, tsSec: In => Long,
      rangeS: Long, delayS: Long, policy: LatePolicy,
      agg: GraftAggregation[In, Acc, Out])(
      implicit outEnc: Encoder[(K, Long, Out)]): Dataset[(K, Long, Out)] = {
    implicit val stateEnc: Encoder[WindowState[Acc]] = Encoders.kryo[WindowState[Acc]]
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[WindowState[Acc], (K, Long, Out)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[In], gs: GroupState[WindowState[Acc]]) =>
          var st = gs.getOption.getOrElse(WindowState[Acc](Long.MinValue, Map.empty))
          val out = ArrayBuffer.empty[(K, Long, Out)]
          rows.toSeq.sortBy(tsSec).foreach { in =>
            val t = tsSec(in)
            val watermark = st.maxTs - delayS
            val wStart = math.floorDiv(t, rangeS) * rangeS
            val isLate = st.maxTs != Long.MinValue && t < watermark &&
              !st.open.contains(wStart)
            if (!isLate) {
              st = WindowState(math.max(st.maxTs, t),
                st.open.updated(wStart,
                  agg.update(in, st.open.getOrElse(wStart, agg.initialAccumulator))))
            } else policy match {
              case LatePolicy.Drop => ()
              case LatePolicy.FirePerMessage =>
                out += ((k, wStart, agg.output(agg.update(in, agg.initialAccumulator))))
              case LatePolicy.PlaceInOldest =>
                val oldest =
                  if (st.open.nonEmpty) st.open.keysIterator.min else wStart
                st = st.copy(open = st.open.updated(oldest,
                  agg.update(in, st.open.getOrElse(oldest, agg.initialAccumulator))))
            }
          }
          val watermark = st.maxTs - delayS
          val (closed, still) = st.open.partition { case (w, _) =>
            w + rangeS <= watermark
          }
          closed.toSeq.sortBy(_._1).foreach { case (w, acc) =>
            out += ((k, w, agg.output(acc)))
          }
          gs.update(st.copy(open = still))
          out.iterator
      }
  }

  case class EphemeralState[Acc](startTs: Long, maxTs: Long,
      triggered: Boolean, acc: Acc)

  /** Ephemeral (trigger) windows — faithful to the reference
    * (/root/reference/lib/wallaroo/core/windows/ephemeral_window.pony:66-127):
    * a key's first event opens a window; `trigger point = open + triggerS`
    * fires the aggregate once the key's watermark (max event ts − delayS)
    * passes it; between trigger and `remove point = trigger +
    * postTriggerS`, late rows follow the policy (Drop or FirePerMessage —
    * PlaceInOldest is invalid for ephemeral windows, as in the reference);
    * past the remove point the state expires and the next event opens a
    * fresh window. Emits (key, windowStartTs, output).
    */
  def ephemeralWindows[In, K: Encoder, Acc, Out](
      ds: Dataset[In], keyFn: In => K, tsSec: In => Long,
      triggerS: Long, postTriggerS: Long, delayS: Long, policy: LatePolicy,
      agg: GraftAggregation[In, Acc, Out])(
      implicit outEnc: Encoder[(K, Long, Out)]): Dataset[(K, Long, Out)] = {
    require(policy != LatePolicy.PlaceInOldest,
      "'Place in oldest window' is not a valid late data policy for ephemeral windows")
    implicit val stateEnc: Encoder[Option[EphemeralState[Acc]]] =
      Encoders.kryo[Option[EphemeralState[Acc]]]
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Option[EphemeralState[Acc]], (K, Long, Out)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[In], gs: GroupState[Option[EphemeralState[Acc]]]) =>
          var st: Option[EphemeralState[Acc]] = gs.getOption.flatten
          val out = ArrayBuffer.empty[(K, Long, Out)]
          def tryTrigger(): Unit = st.foreach { s =>
            if (!s.triggered && s.maxTs - delayS >= s.startTs + triggerS) {
              out += ((k, s.startTs, agg.output(s.acc)))
              st = Some(s.copy(triggered = true))
            }
          }
          rows.toSeq.sortBy(tsSec).foreach { in =>
            val t = tsSec(in)
            // the incoming event advances the key watermark: if it passes an
            // open window's remove point, trigger-if-pending then expire
            // (reference: "arrives after the window was removed → treat as
            // first message", ephemeral_window.pony:70-74)
            st.foreach { s =>
              val wm = math.max(s.maxTs, t) - delayS
              if (wm >= s.startTs + triggerS + postTriggerS) {
                if (!s.triggered && wm >= s.startTs + triggerS)
                  out += ((k, s.startTs, agg.output(s.acc)))
                st = None
              }
            }
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
          gs.update(st)
          out.iterator
      }
  }

  /** Tumbling count windows per key across micro-batches (reference
    * CountWindowsBuilder, windows.pony:105): emit an aggregate every
    * `count` rows; the partial window rides in state between batches.
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
