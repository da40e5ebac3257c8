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
}
