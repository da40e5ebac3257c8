package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing for q_dup_clusters: pair generation vs the
  * component resolution vs the final labeling join, each materialized
  * separately. `runMain graft.tools.ClusterProbe [sfDir] [reps]`.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      val pairs = t("pairs (simhashPairs+checkpoint)") {
        graft.queries.DedupOps.simhashPairs(spark, sfDir)
          .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      }
      val labels = t("connectedComponents (hybrid)") {
        val l = graft.queries.ClusterOps.connectedComponents(pairs, "doc_a", "doc_b")
        l.count(); l
      }
      t("connectedComponents (distributed only)") {
        graft.queries.ClusterOps
          .connectedComponents(pairs, "doc_a", "doc_b", localFinishEdges = 0)
          .count()
      }
      t("final join+window") {
        val base = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
          .join(labels, col("doc_id") === col("node"), "left")
          .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
        base.select(col("doc_id"), col("cluster_id"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster_id"))).as("cluster_size"))
          .orderBy("doc_id").count()
      }
      System.gc() // free superseded checkpoint blocks between reps
    }
    spark.stop()
  }
}
