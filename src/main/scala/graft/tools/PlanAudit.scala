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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        // BroadcastNestedLoopJoin is fine ONLY with a broadcast build
        // side (our bounded theta-joins); flag the shuffle-based form
        "ShuffledNestedLoop" -> (plan.contains("ShuffledHashJoin") && plan.contains("NestedLoop")))
        .collect { case (f, true) => f }
      if (flags.nonEmpty) { bad += 1; println(s"FLAG $name: ${flags.mkString(",")}") }
      spark.catalog.clearCache()
    }
    println(s"audited ${graft.SparkEntry.queries.size} plans, $bad flagged")
    spark.stop()
  }
}
