package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global `row_number` without the single-partition WindowExec.
  *
  * `row_number().over(Window.orderBy(...))` is the one construct Spark
  * cannot scale: the planner hash-partitions on the (empty) partition
  * spec, so the ENTIRE input funnels through one task. This helper
  * produces bit-identical rank values with the classic distributed
  * total-order recipe (the same shape as `RDD.zipWithIndex`, kept
  * inside the DataFrame API so Catalyst/AQE still see the plan):
  *
  *   1. `repartitionByRange` on the sort key — a sampled range
  *      exchange, every partition holds a contiguous, disjoint key
  *      range, partition id ascending with the key order;
  *   2. per-partition `row_number` via a window PARTITIONED BY the
  *      captured range-partition id — each task sorts only its ~n/P
  *      slice, never the whole input;
  *   3. per-partition row counts rolled into cumulative offsets with a
  *      broadcast inequality self-join over the O(P) count table (no
  *      window at all, so the audit rule below has nothing to
  *      allowlist here), added to the local numbers.
  *
  * The range-partitioned table feeds both the count aggregate and the
  * ranking window, and RangePartitioner boundaries are SAMPLED — two
  * independently planned instances of the exchange sample different
  * boundaries (ReuseExchange does not dedup across AQE query stages
  * here; observed at sf0.1: ranks off by ±4), which would make the
  * offsets inconsistent with the pids. So the partitioned table is
  * `localCheckpoint`'d — the repo's standing rule for twice-referenced
  * nondeterministic state (see retentionOf, q_dsir): ONE RDD instance
  * means ONE boundary set, and pid↔offset stay consistent by
  * construction. Cost at scale: the range exchange, the checkpoint
  * write (executor-local, parallel), and the window's hash-by-pid
  * exchange (P keys over P reducers, per-task work O(n/P) per hashed
  * group) plus the O(P) offset table; every stage is fully parallel,
  * no task ever sees more than a partition. Rank values are a pure
  * function of the data (partition placement only shifts work between
  * the local row_number and the offset), so oracle parity is
  * unaffected: callers keep their existing `row_number()`-based DuckDB
  * SQL.
  *
  * The sort key must be a total order (include a unique tie-break
  * column) — same contract the global window had.
  */
object GlobalRank {

  /** Appends `rankCol` (LongType, 1-based) = global row_number over
    * `sortCols`. Accepts sort-ordered columns (`col(...).desc`);
    * plain columns rank ascending, nulls-first (Spark default —
    * callers mirror DuckDB `NULLS FIRST` explicitly where it
    * matters, as with the previous window form).
    *
    * AUDIT HOOK: the checkpoint goes through [[Ckpt.maybe]]
    * (`spark.graft.checkpoint=false` disables it), because the eager
    * localCheckpoint truncates lineage to a LogicalRDD — any plan
    * inspection of a caller's query is then BLIND to everything
    * upstream of the rank — and materializing it runs a real job at
    * plan-construction time. PlanAudit disables checkpointing for its
    * planning pass. EXECUTING with the flag off is incorrect by
    * construction HERE specifically: the un-checkpointed range
    * exchange is referenced twice (counts + ranking) and
    * RangePartitioner samples boundaries per planned instance, so
    * pid↔offset consistency is lost (the exact ±4-ranks bug this
    * checkpoint fixes). Audit-only.
    */
  def globalRowNumber(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__grank_pid", spark_partition_id())
      .transform(Ckpt.maybe)
    val counts = ranged.groupBy(col("__grank_pid")).agg(count(lit(1)).as("__grank_c"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")),
        col("b.__grank_pid") < col("a.__grank_pid"), "left")
      .groupBy(col("a.__grank_pid").as("__grank_pid"))
      .agg(coalesce(sum(col("b.__grank_c")), lit(0L)).as("__grank_off"))
    ranged
      .join(broadcast(offsets), "__grank_pid")
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy(col("__grank_pid")).orderBy(sortCols: _*))
          .cast("long") + col("__grank_off"))
      .drop("__grank_pid", "__grank_off")
  }
}
