package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-windowed aggregation inventory (SURVEY.md §2.10). The reference
  * is one-shot batch (main.rs:4-28) but stores epoch timestamps
  * (repository.rs:178), so its output is time-series-queryable; these
  * are the Spark-native windowed operators, written with the built-in
  * `window`/`session_window` expressions so the *same column logic*
  * runs under Structured Streaming (see graft.streaming.StreamingOps).
  *
  * Window starts are surfaced as epoch-second longs: engine-neutral for
  * the DuckDB oracle and stable across parquet timestamp encodings.
  */
object TimeSeries {

  /** Tumbling 1-hour window aggregation. Spark aligns tumbling windows
    * to the epoch, so `window(ts, '1 hour').start == date_trunc('hour', ts)`.
    */
  def q_time_tumble(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Relational.money(sum(Relational.dec2(col("value")))).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Sliding window: 1 hour wide, sliding every 15 minutes — each event
    * lands in exactly 4 windows, all epoch-aligned. The expansion is a
    * Generator (explode of the 4 window structs) before the hash agg,
    * so it pipelines inside one stage; the only shuffle is the final
    * group-by on (window, event_type).
    */
  def q_time_slide(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Relational.money(sum(Relational.dec2(col("value")))).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Session windows: events grouped into per-user sessions separated
    * by >= 30 minutes of inactivity. Oracle-checked via the DuckDB
    * gaps-and-islands formulation (lag + cumulative flag over
    * (user_id, ts) at microsecond precision) — see SparkEntry.oracleSql;
    * also covered by a unit test with hand-computed sessions.
    */
  def q_time_session(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Relational.money(sum(Relational.dec2(col("value")))).as("sum_value"))
      .select(
        unix_timestamp(col("session_window.start")).as("sess_start"),
        unix_timestamp(col("session_window.end")).as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")
}
