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

  final case class Audit(cartesian: Seq[String], fallbacks: Map[String, Set[String]])

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
      (name, plan.toString.contains("CartesianProduct"), fallbackClassesOf(plan))
    }
    Audit(
      per.collect { case (n, true, _) => n },
      per.collect { case (n, _, fb) if fb.nonEmpty => n -> fb }.toMap)
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
    audit.fallbacks.toSeq.sortBy(_._1).foreach { case (n, fb) =>
      println(s"fallback $n: ${fb.mkString(",")}")
    }
    println(s"audited ${graft.SparkEntry.queries.size} plans, " +
      s"${audit.cartesian.size} flagged, ${audit.fallbacks.size} with fallbacks")
    spark.stop()
  }
}
