package graft.tools
import org.apache.spark.sql.SparkSession
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, d).collect()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
