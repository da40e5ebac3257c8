package graft.tools

import org.apache.spark.sql.SparkSession

/** Mechanical plan audit over the whole query inventory: flags the
  * anti-patterns that stop scaling (cartesian products without a
  * broadcast build side, non-broadcast nested-loop joins) so a
  * regression in any query's plan fails loudly in one run.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // disable auto-broadcast: at tiny audit scale every table fits
      // the 10MB threshold and a would-be CartesianProduct planifies as
      // a harmless-looking BroadcastNestedLoopJoin. With -1 only
      // EXPLICIT broadcast() hints (our bounded theta-joins) broadcast,
      // so the audit sees the plan shape production-size inputs get.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) {
        bad += 1; println(s"FLAG $name: CartesianProduct")
      }
      spark.catalog.clearCache()
    }
    println(s"audited ${graft.SparkEntry.queries.size} plans, $bad flagged")
    spark.stop()
  }
}
