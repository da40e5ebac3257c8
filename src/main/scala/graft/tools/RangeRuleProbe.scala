package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures RewriteRangeJoinRule's effect on a data-scale range join:
  * lineitem prices as points (~600k rows at sf0.1) joined into
  * part-derived price bands, written declaratively (`p >= lo AND
  * p < hi` — no equi keys), timed with auto-broadcast DISABLED (the
  * production regime where the ranges side outgrows a broadcast and
  * the unrewritten plan is a shuffled nested loop).
  *
  *   sbt "runMain graft.tools.RangeRuleProbe [sfDir]"
  */
object RangeRuleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val points = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("p"))
    // ~2k bands of width ~50 spanning the price domain
    val ranges = graft.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("rid"),
        (col("p_partkey") % 2000 * 50.0).as("lo"),
        (col("p_partkey") % 2000 * 50.0 + 75.0).as("hi"))
    def q = points.join(ranges, col("p") >= col("lo") && col("p") < col("hi"))

    def time(label: String): Unit = {
      val plan = q.queryExecution.executedPlan.toString
      val joinKind =
        if (plan.contains("NestedLoop") || plan.contains("Cartesian")) "nested-loop"
        else if (plan.contains("SortMergeJoin")) "sort-merge"
        else if (plan.contains("ShuffledHashJoin")) "shuffled-hash"
        else if (plan.contains("BroadcastHashJoin")) "broadcast-hash"
        else "other"
      val t0 = System.nanoTime()
      val n = q.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[rangeprobe] $label%-10s join=$joinKind%-13s rows=$n%9d  $secs%7.2f s")
    }

    time("warmup")
    time("nested")
    spark.conf.set(graft.plans.RewriteRangeJoinRule.BinWidthKey, "75")
    time("rewritten")
    time("rewritten2")
    spark.conf.unset(graft.plans.RewriteRangeJoinRule.BinWidthKey)
    time("nested2")
    spark.stop()
  }
}
