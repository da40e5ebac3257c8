package graft.tools

import org.apache.spark.sql.SparkSession

/** Mechanical plan audit over the whole query inventory: flags
  * CartesianProduct in any declared query's physical plan, with
  * auto-broadcast disabled so tiny audit inputs can't mask the shape
  * production-size inputs would get. (BroadcastNestedLoopJoin from an
  * EXPLICIT broadcast() hint is acceptable — that is the bounded
  * theta-join pattern — so it is deliberately not flagged.)
  *
  * One implementation, two entry points: [[flaggedQueries]] is called
  * by the main() below and by PlanAuditSpec, so the tool and the test
  * cannot diverge.
  */
object PlanAudit {

  /** Names of queries whose physical plan contains a CartesianProduct.
    * Planning only — nothing executes. The session should have
    * spark.sql.autoBroadcastJoinThreshold=-1 (main() sets it; the spec
    * sets and restores it).
    */
  def flaggedQueries(spark: SparkSession, sfDir: String): Seq[String] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      if (plan.contains("CartesianProduct")) Some(name) else None
    }

  /** CodegenFallback expression classes per query. A fallback
    * expression evicts its whole projection from whole-stage codegen —
    * the round-4 q_sim_ivf lesson (array_max over structs silently ran
    * the 16-cosine E-step interpreted, ~5× slower). Some fallbacks are
    * deliberate (higher-order-function lambdas in per-row text ops,
    * documented at their call sites); the SPEC pins the allowed class
    * set so any NEW fallback class appearing in any plan fails
    * `sbt test` and forces a conscious decision.
    */
  def fallbackClasses(spark: SparkSession, sfDir: String): Map[String, Set[String]] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      spark.catalog.clearCache()
      val classes = plan.collect { case p =>
        p.expressions.flatMap(_.collect {
          case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
            e.getClass.getSimpleName
        })
      }.flatten.toSet
      if (classes.nonEmpty) Some(name -> classes) else None
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = flaggedQueries(spark, sfDir)
    bad.foreach(n => println(s"FLAG $n: CartesianProduct"))
    val fb = fallbackClasses(spark, sfDir)
    fb.values.flatten.groupBy(identity).toSeq.sortBy(-_._2.size).foreach {
      case (cls, qs) => println(s"fallback $cls in ${qs.size} plans")
    }
    println(s"audited ${graft.SparkEntry.queries.size} plans, ${bad.size} flagged")
    spark.stop()
  }
}
