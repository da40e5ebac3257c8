package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit tool's check as a test, so a cartesian-product
  * regression in ANY declared query fails `sbt test`, not just the
  * manually-run tool. Planning only — no query executes.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no declared query plans a CartesianProduct (auto-broadcast disabled)") {
    // with auto-broadcast off, only explicit broadcast() hints
    // broadcast — the plan shape production-size inputs would get
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val audit = graft.tools.PlanAudit.auditPlans(spark, sf)
      assert(audit.cartesian.isEmpty,
        s"cartesian products in: ${audit.cartesian.mkString(", ")}")
      // pin: every CodegenFallback class in the inventory today is a
      // KNOWN, deliberate interpreted family — higher-order-function
      // lambdas (per-row array ops, documented at their call sites),
      // typed Aggregators (TopK/KMV/BoundedCollect run imperative under
      // ObjectHashAggregate by design), and imperative-buffer builtins
      // (percentile/pivot/collect/HLL). A class OUTSIDE this allowlist
      // appearing anywhere needs a conscious decision — that is the
      // round-4 q_sim_ivf lesson (a fallback scalar in a hot
      // projection silently evicts whole-stage codegen).
      val allowed = Set(
        "ArrayTransform", "ArrayFilter", "ArraySort", "ArrayAggregate",
        "ZipWith", // q_sim_ivfpq residual: once per row, linear in dim
        "LambdaFunction", "NamedLambdaVariable",
        "ScalaAggregator",
        "Percentile", "PivotFirst", "CollectSet", "CollectList",
        "HyperLogLogPlusPlus", "HllSketchAgg", "HllUnionAgg", "HllSketchEstimate")
      val novel = audit.fallbacks
        .map { case (q, fb) => q -> (fb -- allowed) }.filter(_._2.nonEmpty)
      assert(novel.isEmpty, s"NEW CodegenFallback classes (not allowlisted): $novel")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("fallback scanner detects a known CodegenFallback through a shuffled plan") {
    import org.apache.spark.sql.functions._
    // self-check with an expression that is still CodegenFallback in
    // Spark 4.1 (`reflect`; the round-4 offender array_max-over-structs
    // gained codegen since, which is why the inventory pins empty).
    // The probe includes a groupBy so the plan carries an exchange —
    // exactly the case where executedPlan would be AQE-wrapped
    // (AdaptiveSparkPlanExec is a LeafExecNode and hides the tree);
    // scanning sparkPlan must still see the expression. Uses the SAME
    // fallbackClassesOf the tool runs, per the one-implementation rule.
    // (spark.range, not a local Seq: ConvertToLocalRelation would
    // evaluate a local projection at optimize time and leave nothing
    // to scan.)
    val probe = spark.range(8)
      .groupBy(expr("reflect('java.lang.String', 'valueOf', id % 2)").as("k"))
      .count()
    assert(probe.queryExecution.executedPlan.getClass.getSimpleName
      .contains("Adaptive"), "probe must exercise the AQE-wrapped case")
    val seen = graft.tools.PlanAudit.fallbackClassesOf(probe.queryExecution.sparkPlan)
    assert(seen.nonEmpty, "fallback scanner failed to detect a known CodegenFallback")
  }
}
