package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the custom bounded-heap top-k operator against the
  * declarative window rank-filter at data scale, including SHUFFLE
  * VOLUME (records + bytes written) — the number that matters at
  * 100 TB. Usage: runMain graft.tools.TopKProbe [sfDir] [k] [reps]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf8x_r10"
    val groupCol = if (args.length > 3) args(3) else "l_partkey"
    val k = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shRecords = new AtomicLong; val shBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shRecords.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        shBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col(groupCol), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    def time(name: String)(f: => Unit): Unit = (1 to reps).foreach { i =>
      shRecords.set(0); shBytes.set(0)
      val t0 = System.nanoTime()
      f
      Thread.sleep(300) // let the listener bus drain
      println(f"[topkprobe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"shuffleRecords=${shRecords.get} shuffleMB=${shBytes.get / 1e6}%.1f")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    time("window") {
      li.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .foreach(_ => ())
    }
    time("heap") {
      graft.plans.TopKPerGroup.topKPerGroup(li,
          Seq(col(groupCol)),
          Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), k)
        .foreach(_ => ())
    }
    spark.stop()
  }
}
