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
      val flagged = graft.tools.PlanAudit.flaggedQueries(spark, sf)
      assert(flagged.isEmpty, s"cartesian products in: ${flagged.mkString(", ")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("no declared query carries a CodegenFallback expression (scanner self-checked)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // self-check with an expression that is still CodegenFallback in
    // Spark 4.1 (`reflect`; the round-4 offender array_max-over-structs
    // gained codegen since, which is why the inventory pins empty).
    // spark.range, not a local Seq: ConvertToLocalRelation would
    // evaluate a projection over local rows at optimize time and leave
    // no expression in the physical plan to scan
    val probe = spark.range(2)
      .select(expr("reflect('java.lang.String', 'valueOf', id)").as("m"))
    val seen = probe.queryExecution.executedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
          e.getClass.getSimpleName
      })
    }.flatten
    assert(seen.nonEmpty, "fallback scanner failed to detect a known CodegenFallback")
    // pin: the whole declared inventory is fallback-free today; a new
    // fallback class appearing anywhere needs a conscious decision
    val fb = graft.tools.PlanAudit.fallbackClasses(spark, sf)
    assert(fb.isEmpty, s"new CodegenFallback expressions: $fb")
  }
}
