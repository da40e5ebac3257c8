package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Mechanical plan audit over the whole query inventory: flags
  * CartesianProduct in any declared query's physical plan, with
  * auto-broadcast disabled so tiny audit inputs can't mask the shape
  * production-size inputs would get. (BroadcastNestedLoopJoin from an
  * EXPLICIT broadcast() hint is acceptable — that is the bounded
  * theta-join pattern — so it is deliberately not flagged.) Also
  * collects every CodegenFallback expression class per plan — the
  * round-4 lesson: one fallback expression evicts its whole projection
  * from whole-stage codegen (q_sim_ivf's E-step silently ran
  * interpreted, ~5× slower).
  *
  * One implementation, two entry points: [[auditPlans]] is called by
  * the main() below and by PlanAuditSpec, so the tool and the test
  * cannot diverge.
  */
object PlanAudit {

  final case class Audit(
      cartesian: Seq[String],
      fallbacks: Map[String, Set[String]],
      globalWindows: Seq[String])

  /** Unpartitioned WindowExec nodes whose input is not visibly bounded.
    *
    * `Window.orderBy(...)` with no partition spec plans a
    * SINGLE-PARTITION exchange — the whole input funnels through one
    * task, the one construct that cannot survive a scale-up (the
    * round-9/10 q_rfm/q_ccnet_split/q_lorenz finding; they now rank
    * via [[graft.plans.GlobalRank]]). A window whose child subtree
    * contains a limit (top-N tables: GlobalLimit/LocalLimit/
    * TakeOrderedAndProject/CollectLimit) is auto-accepted — its input
    * is bounded by construction. Anything else must be explicitly
    * allowlisted in [[globalWindowAllowlist]] with the reason its
    * input is bounded, or the audit flags it.
    */
  def unpartitionedWindows(plan: SparkPlan): Int = {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{
      CollectLimitExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          !w.child.exists {
            case _: GlobalLimitExec | _: LocalLimitExec |
                 _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
            case _ => false
          } => w
    }.size
  }

  /** Queries allowed to keep an unpartitioned window, each with the
    * reason its window input is BOUNDED (so the single task sees a
    * model-sized table, not the data). Reviewed per entry — adding to
    * this map is a conscious scale decision, not a convenience.
    */
  val globalWindowAllowlist: Map[String, String] = Map(
    "q_approx_pct" -> "64-bin histogram spine (fixed bin count)",
    "q_concurrency" -> "O(hours) calendar-bounded carry spine; in-hour sweep is partitioned by hr",
    "q_cusum" -> "calendar-bounded dense hour spine",
    "q_funnel" -> "4-row funnel-stage report (post-agg, O(stages))",
    "q_heaps" -> "O(docs/1024) bucket-carry spine - 1024x reduced before the single task; recurse the carry for another 1024x if a corpus ever needs it",
    "q_ks" -> "O(distinct n_chars) value-count spine",
    "q_lorenz" -> "10-row decile cumulative (post-agg); the O(docs) rank itself runs via GlobalRank",
    "q_mannwhitney" -> "O(distinct n_chars) value-count spine (the q_ks shape)",
    "q_skew_stats" -> "counts-of-counts spine, O(distinct per-key count values)",
    "q_survival" -> "O(distinct lifetimes <= observed day span) value-count spine")

  /** CodegenFallback expression classes in one physical plan. */
  def fallbackClassesOf(plan: SparkPlan): Set[String] =
    plan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
          e.getClass.getSimpleName
      })
    }.flatten.toSet

  /** One planning pass over every declared query: cartesian-product
    * flags plus per-query CodegenFallback classes. Scans
    * `queryExecution.sparkPlan` — the PRE-AQE physical plan — because
    * `executedPlan` wraps any plan with an exchange in
    * AdaptiveSparkPlanExec, which is a LeafExecNode: a tree collect
    * over it visits one node and sees no expressions, making an
    * executedPlan-based scan vacuous for nearly every real query.
    * (The CartesianProduct check uses the same plan for consistency;
    * AQE never introduces a cartesian product that the static plan
    * lacks.) Planning only — nothing executes. The session should
    * have spark.sql.autoBroadcastJoinThreshold=-1 (main() sets it;
    * the spec sets and restores it).
    */
  def auditPlans(spark: SparkSession, sfDir: String): Audit = {
    val per = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      spark.catalog.clearCache()
      (name, plan.toString.contains("CartesianProduct"), fallbackClassesOf(plan),
        unpartitionedWindows(plan))
    }
    Audit(
      per.collect { case (n, true, _, _) => n },
      per.collect { case (n, _, fb, _) if fb.nonEmpty => n -> fb }.toMap,
      per.collect {
        case (n, _, _, w) if w > 0 && !globalWindowAllowlist.contains(n) => n
      })
  }

  /** Names of queries whose physical plan contains a CartesianProduct
    * (kept for callers that only need the flag list).
    */
  def flaggedQueries(spark: SparkSession, sfDir: String): Seq[String] =
    auditPlans(spark, sfDir).cartesian

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val audit = auditPlans(spark, sfDir)
    audit.cartesian.foreach(n => println(s"FLAG $n: CartesianProduct"))
    audit.globalWindows.foreach(n =>
      println(s"FLAG $n: unpartitioned WindowExec over unbounded input"))
    audit.fallbacks.toSeq.sortBy(_._1).foreach { case (n, fb) =>
      println(s"fallback $n: ${fb.mkString(",")}")
    }
    println(s"audited ${graft.SparkEntry.queries.size} plans, " +
      s"${audit.cartesian.size + audit.globalWindows.size} flagged, " +
      s"${audit.fallbacks.size} with fallbacks")
    spark.stop()
  }
}
