package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for cross-query interference inside one bench
  * session: runs SETUP queries once (comma-separated, arg 0), then
  * times TARGET (arg 1) n times (arg 2) — all in one session, like
  * Bench. If TARGET is slower here than in TimeOne isolation, a setup
  * query is degrading the session (lingering blocks, listener backlog,
  * codec caches, ...).
  */
object InterferProbe {
  def main(args: Array[String]): Unit = {
    val setup = args(0).split(",").filter(_.nonEmpty)
    val target = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
    setup.foreach { s =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(s)(spark, sfDir).count()
      spark.catalog.clearCache()
      println(f"[probe] setup $s: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // foreach, not count() — see TimeOne (count prunes the per-row
      // projection work this probe exists to measure)
      graft.SparkEntry.queries(target)(spark, sfDir).foreach(_ => ())
      println(f"[probe] $target run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
