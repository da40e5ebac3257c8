package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Conf-gated `localCheckpoint` — the repo's single funnel for the
  * twice-referenced-state rule (every materialization in the query
  * inventory goes through here; `grep localCheckpoint()` outside this
  * file and test code should come up empty).
  *
  * Default: identical to `df.localCheckpoint()` — eager, truncates
  * lineage, one RDD instance for every downstream reference. This is
  * correctness-critical wherever the checkpointed subtree is
  * nondeterministic AND referenced more than once (sampled
  * RangePartitioner boundaries in [[GlobalRank]], spark_partition_id
  * captures) and performance-critical for the iteration kernels
  * (edges read K times).
  *
  * Two audit hooks (ADVICE r11 — the eager checkpoint truncates the
  * logical plan to a LogicalRDD, so any plan rule was BLIND to the
  * entire subtree beneath each of the ~85 checkpoint sites, including
  * every GlobalRank caller's upstream):
  *
  *  - `spark.graft.ckptCapture=true`: checkpoints still happen (so
  *    constructors that collect model tables keep their truncated,
  *    recompute-free lineage), but each site FIRST records its
  *    pre-checkpoint physical plan segment in [[drainCaptured]]'s
  *    queue. PlanAudit runs every rule over the final plan PLUS all
  *    captured segments — piecewise-complete coverage: every operator
  *    appears in exactly the segment between its two nearest
  *    checkpoints. This is the full-inventory audit path.
  *  - `spark.graft.checkpoint=false`: skip checkpointing entirely —
  *    the whole tree stays in ONE plan. Only safe for surgical
  *    single-plan inspection (GlobalRankSpec's hook test): on real
  *    keys it both breaks pid↔offset correctness in GlobalRank and
  *    re-computes un-truncated lineage in every constructor collect
  *    (measured: the 236-key audit never finishes). Never execute
  *    results under it.
  */
object Ckpt {
  private val captured =
    new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()

  /** Remove and return every plan segment captured since the last
    * drain. Single audit thread assumed — segments captured during
    * one query's construction are attributed to that query.
    */
  def drainCaptured(): Seq[SparkPlan] = {
    val out = Seq.newBuilder[SparkPlan]
    var p = captured.poll()
    while (p != null) { out += p; p = captured.poll() }
    out.result()
  }

  def maybe(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    if (conf.get("spark.graft.ckptCapture", "false").toBoolean)
      captured.add(df.queryExecution.sparkPlan)
    if (conf.get("spark.graft.checkpoint", "true").toBoolean)
      df.localCheckpoint()
    else df
  }

  /** [[maybe]] for LAYOUT-CARRYING materializations (r16 find): the
    * copart iteration kernels rely on the checkpointed edge table
    * keeping its hashpartitioning so each iteration join exchanges
    * only the O(nodes) state — but under AQE,
    * `Dataset.localCheckpoint` records UnknownPartitioning in the
    * LogicalRDD (the AdaptiveSparkPlan does not expose its final
    * partitioning to the checkpoint path), which silently
    * re-introduced one full EDGE exchange per iteration
    * (q_pagerank_copart's executed plan carried a
    * hashpartitioning(src) ENSURE_REQUIREMENTS exchange on every
    * iteration join; probed directly: a shuffle-hash self-join over
    * an AQE-on checkpoint plans 2 exchanges, over an AQE-off
    * checkpoint ZERO). Disabling AQE around just this one
    * materialization restores the recorded partitioning; the builds
    * routed here are fixed-shape window/repartition plans that gain
    * nothing from AQE, and the conf flip is scoped to the eager
    * checkpoint call.
    */
  def maybePartitioned(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    if (conf.get("spark.graft.ckptCapture", "false").toBoolean)
      captured.add(df.queryExecution.sparkPlan)
    if (conf.get("spark.graft.checkpoint", "true").toBoolean) {
      val prev = conf.get("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.localCheckpoint()
      finally conf.set("spark.sql.adaptive.enabled", prev)
    } else df
  }
}
