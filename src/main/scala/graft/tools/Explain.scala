package graft.tools

import org.apache.spark.sql.SparkSession

/** Print formatted physical plans for named queries (plan-quality
  * review loop: pushed filters, pruned schemas, join strategies,
  * WholeStageCodegen spans). Usage:
  *   runMain graft.tools.Explain <sfDir> <query...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
