package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
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
}
