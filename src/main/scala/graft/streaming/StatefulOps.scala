package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming (SURVEY.md §2.10 / spark guide:
  * `KeyValueGroupedDataset.mapGroupsWithState`): per-user lifetime
  * stats maintained across micro-batches — the API surface for state
  * the built-in windows can't express (counters, ML feature state,
  * fraud scores).
  */
object StatefulOps {

  final case class Ev(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserState(n: Long, total: Double, maxValue: Double)

  final case class UserStats(
      user_id: Long, n: Long, total: Double, maxValue: Double, highSpender: Boolean)

  /** One updated row per user per micro-batch; state never expires
    * (NoTimeout) — a production job would pick an event-time timeout
    * keyed to data retention so state is bounded.
    */
  def runningUserStats(events: Dataset[Ev]): Dataset[UserStats] = {
    implicit val stateEnc  = Encoders.product[UserState]
    implicit val outEnc    = Encoders.product[UserStats]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Double.MinValue))
          val next = evs.foldLeft(prev) { (acc, e) =>
            UserState(acc.n + 1, acc.total + e.value, math.max(acc.maxValue, e.value))
          }
          state.update(next)
          UserStats(user, next.n, next.total, next.maxValue, next.total > 1000.0)
      }
  }

  final case class FunnelState(reached: Int, tlast: Long, t1: Long)

  final case class UserFunnel(user_id: Long, reached: Int)

  /** Streaming conversion funnel — the incremental
    * mapGroupsWithState counterpart of
    * [[graft.queries.TimeSeries.q_funnel]]'s greedy chain (the
    * classic stateful-CEP shape: per-key pattern matching with
    * constant state). State is THREE longs per user (chain depth,
    * last matched ts, first-signup anchor) no matter how many events
    * stream past — the bounded-state stance of [[streamingDistinct]].
    *
    * Semantics parity: within a micro-batch events are sorted by
    * (event-time micros, stage) before the fold, so intra-batch
    * disorder is absorbed; ACROSS batches the greedy state cannot
    * rewind, so exact batch parity holds when batch boundaries
    * respect event-time order (a replay, or a live feed under a
    * watermark that holds back stragglers — the same contract
    * [[graft.streaming.StreamingOps.streamingDsirScore]] documents
    * for its model). StreamingSpec pins user-for-user equality with
    * the batch kernel across a two-batch ordered replay, including a
    * chain that COMPLETES across the batch boundary. NoTimeout: a
    * production job would expire users
    * [[graft.queries.TimeSeries.FunnelWindowMicros]] past their
    * anchor — after the deadline the state can never change again.
    */
  def streamingFunnel(events: Dataset[Ev]): Dataset[UserFunnel] = {
    val stages = graft.queries.TimeSeries.FunnelStages
    val idx = stages.zipWithIndex.toMap
    val W = graft.queries.TimeSeries.FunnelWindowMicros
    val last = stages.length
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc   = Encoders.product[UserFunnel]
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events
      .filter(e => idx.contains(e.event_type))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val sorted = evs.toArray.sortBy(e => (micros(e.ts), idx(e.event_type)))
          val next = sorted.foldLeft(prev) { (acc, e) =>
            val tu = micros(e.ts)
            val st = idx(e.event_type)
            if (acc.reached == 0 && st == 0) FunnelState(1, tu, tu)
            else if (acc.reached >= 1 && acc.reached < last && st == acc.reached &&
                tu > acc.tlast && tu <= acc.t1 + W)
              FunnelState(acc.reached + 1, tu, acc.t1)
            else acc
          }
          state.update(next)
          UserFunnel(user, next.reached)
      }
  }

  /** Change-log variant of [[streamingFunnel]] via
    * `flatMapGroupsWithState` — emits a row ONLY when a user's chain
    * depth advances (the CDC/update-stream shape: downstream
    * consumers see transitions, not per-batch re-statements, so sink
    * volume is bounded by 4 rows per user ever instead of
    * rows-per-batch × users). Same kernel, same state; the
    * flatMap API is what allows "this batch changed nothing for this
    * user → emit nothing".
    */
  def streamingFunnelUpdates(events: Dataset[Ev]): Dataset[UserFunnel] = {
    val stages = graft.queries.TimeSeries.FunnelStages
    val idx = stages.zipWithIndex.toMap
    val W = graft.queries.TimeSeries.FunnelWindowMicros
    val last = stages.length
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc   = Encoders.product[UserFunnel]
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events
      .filter(e => idx.contains(e.event_type))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val sorted = evs.toArray.sortBy(e => (micros(e.ts), idx(e.event_type)))
          val next = sorted.foldLeft(prev) { (acc, e) =>
            val tu = micros(e.ts)
            val st = idx(e.event_type)
            if (acc.reached == 0 && st == 0) FunnelState(1, tu, tu)
            else if (acc.reached >= 1 && acc.reached < last && st == acc.reached &&
                tu > acc.tlast && tu <= acc.t1 + W)
              FunnelState(acc.reached + 1, tu, acc.t1)
            else acc
          }
          state.update(next)
          if (next.reached > prev.reached) Iterator.single(UserFunnel(user, next.reached))
          else Iterator.empty
      }
  }

  /** [[streamingFunnel]] with bounded KEY population — the
    * production state-hygiene variant: once the event-time watermark
    * passes a user's conversion deadline (anchor + 72 h) the state
    * can never change again, so it is EXPIRED via
    * `GroupStateTimeout.EventTimeTimeout` — on timeout the user's
    * final depth is emitted once and the state removed. Without
    * this, per-user state is 3 longs *forever* and the key
    * population grows with all users ever seen; with it, live state
    * is bounded by users active inside one deadline horizon. Users
    * who never signed up expire silently (no final row — they were
    * never in the funnel).
    *
    * The caller must `.withWatermark` the input (the test uses the
    * events `ts` column); timeouts fire when the watermark passes
    * the registered timestamp, i.e. lazily on the next micro-batch.
    */
  def streamingFunnelExpiring(events: Dataset[Ev]): Dataset[UserFunnel] = {
    val stages = graft.queries.TimeSeries.FunnelStages
    val idx = stages.zipWithIndex.toMap
    val W = graft.queries.TimeSeries.FunnelWindowMicros
    val last = stages.length
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc   = Encoders.product[UserFunnel]
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events
      .filter(e => idx.contains(e.event_type))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // deadline passed: emit the final depth once (if the user
            // ever entered the funnel) and drop the state
            val fin = state.get
            state.remove()
            if (fin.reached >= 1) Iterator.single(UserFunnel(user, fin.reached))
            else Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
            val sorted = evs.toArray.sortBy(e => (micros(e.ts), idx(e.event_type)))
            val next = sorted.foldLeft(prev) { (acc, e) =>
              val tu = micros(e.ts)
              val st = idx(e.event_type)
              if (acc.reached == 0 && st == 0) FunnelState(1, tu, tu)
              else if (acc.reached >= 1 && acc.reached < last && st == acc.reached &&
                  tu > acc.tlast && tu <= acc.t1 + W)
                FunnelState(acc.reached + 1, tu, acc.t1)
              else acc
            }
            state.update(next)
            // anchored users expire at their own deadline; never-signed-up
            // users expire as soon as the watermark passes their last
            // event (their chain can only start from a FUTURE signup,
            // which would re-create state)
            val expireAtMicros =
              if (next.reached >= 1) next.t1 + W
              else sorted.lastOption.map(e => micros(e.ts)).getOrElse(0L) + 1L
            // a timeout timestamp at or below the current watermark is
            // rejected by Spark — clamp for users whose deadline was
            // already in the past when their (late) events arrived
            state.setTimeoutTimestamp(
              math.max(expireAtMicros / 1000L, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  final case class KeyDistinct(key: String, n_kept: Long, approx_distinct: Double)

  /** Streaming distinct-count per key with BOUNDED state: the KMV
    * sketch (functions.KmvAggregator) maintained across micro-batches
    * via mapGroupsWithState — O(k) longs per key forever, no matter
    * how many distinct values stream past. Uses the same 60-bit md5
    * hash as the batch `q_sketch_kmv`, so a streaming sketch equals
    * the batch sketch of the same values bit-for-bit (tested), and a
    * batch backfill can seed streaming state directly. Same NoTimeout
    * caveat as [[runningUserStats]]: production keys come and go, so
    * an event-time timeout bounds the KEY population; the per-key
    * state is already hard-bounded here.
    */
  def streamingDistinct(
      rows: Dataset[(String, String)], k: Int = 32): Dataset[KeyDistinct] = {
    implicit val stateEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    implicit val outEnc: Encoder[KeyDistinct] = Encoders.product[KeyDistinct]
    val agg = new graft.functions.KmvAggregator(k)
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, vs: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          val buf = scala.collection.mutable.ArrayBuffer
            .from(state.getOption.getOrElse(Array.empty[Long]))
          vs.foreach(v => agg.reduce(buf, graft.functions.KmvAggregator.hash60(v._2)))
          val sk = agg.finish(buf)
          state.update(sk)
          val est =
            if (sk.length < k) sk.length.toDouble
            else {
              val twoTo60 = 1152921504606846976.0
              // BigDecimal HALF_UP at scale 4 — exactly Spark's
              // round(x, 4), which the batch q_sketch_kmv applies.
              // math.rint would be half-to-even: on an exact .00005
              // boundary the streaming and batch estimates would
              // diverge, breaking the documented bit-for-bit parity
              BigDecimal((k - 1) * twoTo60 / sk(k - 1))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
          KeyDistinct(key, sk.length.toLong, est)
      }
  }

  final case class KeyHeavy(key: String, counters: Map[String, Long])

  /** Streaming heavy hitters per key with BOUNDED state: the
    * Misra–Gries summary ([[graft.functions.MisraGriesAggregator]])
    * maintained across micro-batches via mapGroupsWithState — O(k)
    * counters per key forever, no matter how many distinct values
    * stream past (the [[streamingDistinct]] stance applied to
    * top-frequency). Each micro-batch folds through the SAME `reduce`
    * the batch aggregator uses, so resuming from state IS the
    * continuation of one long fold — and the mergeable guarantee,
    * true − ⌊N/(k+1)⌋ ≤ ĉ ≤ true, holds at EVERY batch boundary
    * regardless of how the stream was sliced or which arrival order
    * the shuffle delivered (tested across boundaries; the estimates
    * themselves are arrival-order-dependent, the guarantee is not).
    */
  def streamingHeavyHitters(
      rows: Dataset[(String, String)], k: Int = 16): Dataset[KeyHeavy] = {
    implicit val stateEnc: Encoder[scala.collection.mutable.ArrayBuffer[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        scala.collection.mutable.ArrayBuffer[(String, Long)]]()
    implicit val outEnc: Encoder[KeyHeavy] = Encoders.product[KeyHeavy]
    val agg = new graft.functions.MisraGriesAggregator(k)
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, vs: Iterator[(String, String)],
         state: GroupState[scala.collection.mutable.ArrayBuffer[(String, Long)]]) =>
          var buf = state.getOption
            .getOrElse(scala.collection.mutable.ArrayBuffer.empty[(String, Long)])
          vs.foreach(v => buf = agg.reduce(buf, v._2))
          state.update(buf)
          KeyHeavy(key, agg.finish(buf))
      }
  }

  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of [[graft.queries.TimeSeries.q_transitions]] —
    * the Markov transition stream as incremental CEP: state is ONE
    * string per user (the last event type), and every arriving event
    * emits its (prev, next) transition row. Downstream, a streaming
    * `groupBy(prev_type, next_type).count()` IS the batch matrix —
    * the mergeable-statistic stance of streamingValueHist. Events
    * are ordered per batch by the batch key's exact (epoch-second,
    * event_id) contract, so an ordered replay emits precisely the
    * batch key's transition multiset (tested count-for-count).
    */
  def streamingTransitions(events: Dataset[Ev]): Dataset[Transition] = {
    implicit val stateEnc: Encoder[String]    = Encoders.STRING
    implicit val outEnc: Encoder[Transition]  = Encoders.product[Transition]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[String]) =>
          val sorted = evs.toSeq.sortBy(e =>
            (Math.floorDiv(e.ts.getTime, 1000L), e.event_id))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption.orNull
          sorted.foreach { e =>
            if (last != null) out += Transition(user, last, e.event_type)
            last = e.event_type
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }

  final case class HourCount(hr: Long, n: Long)

  final case class SpikeState(
      ring: Seq[HourCount], curHr: Long, curN: Long, started: Boolean)

  final case class SpikeFlag(
      event_type: String, hr: Long, n: Long, w: Long, is_spike: Boolean)

  /** Streaming twin of [[graft.queries.TimeSeries.q_spikes]] — the 3σ
    * hourly rate-spike detector as incremental CEP: per event type,
    * state is the CURRENT (incomplete) hour's count plus a ring of
    * the last 24 COMPLETED hourly counts; when a later hour first
    * appears, the previous hour completes and its flag is emitted
    * (flatMapGroupsWithState change-log shape). The flag test is the
    * same all-integer cross-multiplication as the batch key —
    * (w·n−S)² > 9·(w·Q−S²), upward-only, warm-up-gated — over the
    * SAME trailing-24-observed-hours window, so a replay of an
    * arrival-ordered stream reproduces the batch flags
    * hour-for-hour (tested; the stream's final, never-completed hour
    * is the one row batch emits that streaming by construction
    * cannot yet).
    *
    * State is HARD-BOUNDED at 24+1 hour counters per type — the flag
    * for hour h reads only the 24 observed hours before it, so the
    * ring IS the full sufficient statistic; unlike the funnel family
    * no event-time timeout is needed for state growth, only for key
    * retirement. Cross-batch late events for already-completed hours
    * are dropped (the watermark stance; this corpus is measured
    * arrival-ordered, NOTES r9).
    */
  def streamingSpikes(events: Dataset[Ev], wMin: Int = 12): Dataset[SpikeFlag] = {
    implicit val stateEnc: Encoder[SpikeState] = Encoders.product[SpikeState]
    implicit val outEnc: Encoder[SpikeFlag]    = Encoders.product[SpikeFlag]
    events
      .groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, evs: Iterator[Ev], state: GroupState[SpikeState]) =>
          def flagOf(ring: Seq[HourCount], hr: Long, n: Long): SpikeFlag = {
            val w = ring.length.toLong
            val s = ring.iterator.map(_.n).sum
            val q = ring.iterator.map(h => h.n * h.n).sum
            SpikeFlag(tpe, hr, n, w,
              w >= wMin &&
                (w * n - s) * (w * n - s) > 9L * (w * q - s * s) &&
                n * w > s)
          }
          // batch events bucketed to hours, processed in hour order
          // (epoch-millis floorDiv == the batch key's
          // `unix_timestamp(ts) div 3600` on any sign)
          val batch = evs.toSeq
            .groupBy(e => Math.floorDiv(e.ts.getTime, 3600000L))
            .toSeq.sortBy(_._1)
          var st = state.getOption.getOrElse(SpikeState(Nil, 0L, 0L, started = false))
          val out = Seq.newBuilder[SpikeFlag]
          batch.foreach { case (hr, es) =>
            val cnt = es.length.toLong
            if (!st.started) st = SpikeState(Nil, hr, cnt, started = true)
            else if (hr == st.curHr) st = st.copy(curN = st.curN + cnt)
            else if (hr < st.curHr) () // late hour: dropped (watermark stance)
            else {
              out += flagOf(st.ring, st.curHr, st.curN)
              val ring = (st.ring :+ HourCount(st.curHr, st.curN)).takeRight(24)
              st = SpikeState(ring, hr, cnt, started = true)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class SessState(sUs: Long, lastUs: Long)

  final case class SessionOut(user_id: Long, s_us: Long, e_us: Long)

  /** Streaming sessionization — the stateful counterpart of
    * [[graft.queries.TimeSeries.q_time_session]]'s `session_window`
    * (and the interval FEED for [[graft.queries.TimeSeries
    * .q_concurrency]] / [[graft.queries.TimeSeries.q_join_overlap]],
    * which consume exactly these half-open [s_us, e_us) intervals):
    * per-user state is TWO longs (session start, last event time); a
    * new event extends the open session when it lands strictly within
    * `gapUs` of the last one (the `session_window` rule: a gap ≥ 30
    * minutes closes), otherwise the closed session is emitted with
    * e_us = last + gap and a fresh session opens. Sessions whose gap
    * never arrives close by EVENT-TIME TIMEOUT: when the watermark
    * passes last + gap the state expires and the session is emitted —
    * so every session is emitted exactly once, closed by data or by
    * the watermark, and state is bounded by the LIVE user population.
    *
    * Parity contract ([[streamingFunnel]] stance): intra-batch
    * disorder is absorbed by sorting each batch's events; across
    * batches the fold cannot rewind, so batch parity holds under
    * ordered replay or a watermark that holds back stragglers.
    * AggregatorSpec pins interval-for-interval equality with the
    * batch `session_window` over a replay whose sessions close both
    * ways (by a later event and by expiry).
    */
  def streamingSessions(events: Dataset[Ev],
      gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc   = Encoders.product[SessionOut]
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.sUs, s.lastUs + gapUs))
          } else {
            val sorted = evs.map(e => micros(e.ts)).toArray.sorted
            val closed = List.newBuilder[SessionOut]
            var st = state.getOption
            sorted.foreach { tu =>
              st match {
                case Some(s) if tu - s.lastUs < gapUs =>
                  st = Some(SessState(s.sUs, math.max(s.lastUs, tu)))
                case Some(s) =>
                  closed += SessionOut(user, s.sUs, s.lastUs + gapUs)
                  st = Some(SessState(tu, tu))
                case None =>
                  st = Some(SessState(tu, tu))
              }
            }
            st.foreach { s =>
              state.update(s)
              // close by watermark when no later event arrives; clamp
              // above the current watermark (Spark rejects timeouts at
              // or below it) for sessions already stale on arrival
              state.setTimeoutTimestamp(
                math.max((s.lastUs + gapUs) / 1000L,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  final case class TouchState(first: String, last: String)

  final case class Credit(user_id: Long, event_id: Long, model: String,
      touch_type: String, cents: Long)

  /** Streaming twin of [[graft.queries.TimeSeries.q_attribution]] —
    * attribution as incremental CEP: state is TWO strings per user
    * (the earliest and the most recent touch type so far — the full
    * sufficient statistic for both models, hard-bounded with no
    * timeout, the streamingSpikes stance), and every arriving
    * purchase emits its two (model, touch_type, cents) credit rows
    * the moment it lands. Downstream, a streaming
    * `groupBy(model, touch_type).agg(count, sum(cents))` IS the batch
    * report. Events are ordered per batch by the batch key's exact
    * (tu, event_id) contract — micros derived from the Timestamp so
    * same-millisecond events order identically to the batch window's
    * `unix_micros` sort. Cents use the batch side's DECIMAL(18,2)
    * HALF_UP contract via BigDecimal.
    */
  def streamingAttribution(events: Dataset[Ev]): Dataset[Credit] = {
    implicit val stEnc: Encoder[TouchState] = Encoders.product[TouchState]
    implicit val outEnc: Encoder[Credit] = Encoders.product[Credit]
    val touches = Set("signup", "view", "click")
    def micros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[TouchState]) =>
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(TouchState(null, null))
          val out = Seq.newBuilder[Credit]
          sorted.foreach { e =>
            if (e.event_type == "purchase") {
              val cents = java.math.BigDecimal.valueOf(e.value)
                .setScale(2, java.math.RoundingMode.HALF_UP)
                .movePointRight(2).longValueExact()
              out += Credit(user, e.event_id, "first",
                Option(st.first).getOrElse("(none)"), cents)
              out += Credit(user, e.event_id, "last",
                Option(st.last).getOrElse("(none)"), cents)
            } else if (touches(e.event_type)) {
              st = TouchState(
                if (st.first == null) e.event_type else st.first,
                e.event_type)
            }
          }
          if (st.first != null) state.update(st)
          out.result().iterator
      }
  }

  final case class QRec(rec_id: Long, qclass: String)

  final case class KAnonState(nSeen: Long, buffered: List[Long])

  /** Streaming k-anonymity release gate — the live-feed counterpart
    * of [[graft.queries.SampleOps.q_kanon]]: records are held back
    * until their quasi-identifier class has accumulated at least k
    * members, then the whole class (buffered backlog first, everything
    * after immediately) flows through. The publish-side control for a
    * stream that must never expose a cohort an adversary could narrow
    * below k — small-cell suppression that self-heals as cells fill.
    *
    * State is HARD-BOUNDED by construction: at most k−1 buffered
    * rec_ids plus one counter per class — once a class crosses k the
    * buffer is flushed and never refills (nSeen ≥ k short-circuits to
    * pass-through), so lifetime state per class is O(k) no matter how
    * many records stream past. NoTimeout is deliberate: a class's
    * gate must stay open forever once earned, and an under-k class's
    * ≤ k−1 backlog is exactly the data a batch release would suppress
    * — expiring it would silently drop records a later arrival should
    * have released.
    *
    * Contract (pinned in StreamingSpec across a two-batch replay where
    * a class crosses k AT the batch boundary): every record is emitted
    * exactly once, no record is emitted while its class has seen < k,
    * and the released set equals the batch rule "rows whose class
    * size ≥ k" once the stream drains. Within a batch the intra-class
    * emit order is rec_id-sorted for determinism.
    */
  def streamingKAnonGate(rows: Dataset[QRec], k: Int = 10): Dataset[QRec] = {
    implicit val stEnc: Encoder[KAnonState] = Encoders.product[KAnonState]
    implicit val outEnc: Encoder[QRec] = Encoders.product[QRec]
    rows
      .groupByKey(_.qclass)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cls: String, recs: Iterator[QRec], state: GroupState[KAnonState]) =>
          val prev = state.getOption.getOrElse(KAnonState(0L, Nil))
          val batch = recs.map(_.rec_id).toArray.sorted
          val total = prev.nSeen + batch.length
          if (prev.nSeen >= k) {
            state.update(KAnonState(total, Nil))
            batch.iterator.map(QRec(_, cls))
          } else if (total >= k.toLong) {
            state.update(KAnonState(total, Nil))
            (prev.buffered.sorted ++ batch).iterator.map(QRec(_, cls))
          } else {
            state.update(KAnonState(total, prev.buffered ++ batch.toList))
            Iterator.empty
          }
      }
  }

  final case class KeySample(key: String, ids: Array[Long], keys_fp: Array[Long])

  /** Streaming Efraimidis–Spirakis exact-k weighted sample per key
    * with BOUNDED state — the streaming twin of
    * [[graft.queries.SampleOps.q_sample_es]]: each arriving element
    * carries its deterministic ES key (the md5-draw −ln(u)/w fixed
    * point, computed upstream with the SAME shared spelling the batch
    * key uses), and the reservoir is simply the k SMALLEST
    * (key_fp, id) pairs seen so far. The min-k fold is associative,
    * commutative and duplicate-stable, so — unlike the Misra–Gries
    * sketch, whose estimates are arrival-order-dependent and only
    * carry a band guarantee — the streamed reservoir is
    * BIT-IDENTICAL to the batch `orderBy(key_fp, id).limit(k)` over
    * the same rows at EVERY batch boundary, no matter how the stream
    * was sliced or what order the shuffle delivered
    * (the [[streamingDistinct]] exact-parity class; a batch backfill
    * can seed streaming state with zero selection drift). State per
    * key: 2k longs, forever.
    *
    * Input rows: (group key, id, key_fp). Output per updated group
    * and micro-batch: the current sample, ids ordered by selection
    * rank (key_fp asc, id asc tiebreak).
    */
  def streamingWeightedSample(
      rows: Dataset[(String, Long, Long)], k: Int = 8): Dataset[KeySample] = {
    implicit val stateEnc: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    implicit val outEnc: Encoder[KeySample] = Encoders.product[KeySample]
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, vs: Iterator[(String, Long, Long)],
         state: GroupState[Array[Long]]) =>
          // state: [key_fp0, id0, key_fp1, id1, ...] in selection order
          val prev = state.getOption.getOrElse(Array.empty[Long])
            .grouped(2).map(a => (a(0), a(1))).toSeq
          val kept = (prev ++ vs.map(v => (v._3, v._2)))
            .distinct.sorted.take(k)
          state.update(kept.flatMap(p => Seq(p._1, p._2)).toArray)
          KeySample(key, kept.map(_._2).toArray, kept.map(_._1).toArray)
      }
  }
}
