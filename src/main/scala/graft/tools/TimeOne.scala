package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness: run one declared query N times and print
  * per-run seconds (first run = cold plan+codegen, rest warm).
  * `runMain graft.tools.TimeOne q_minhash [n] [sfDir]`
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B the dedup hash families: SPARK_GRAFT_HASH_FAMILY=xxh64
    sys.env.get("SPARK_GRAFT_HASH_FAMILY")
      .foreach(spark.conf.set("spark.graft.hashFamily", _))
    // generic conf passthrough: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    // JVM/codegen warmup; NonFatal only — an OOM here must surface
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known queries: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // foreach, not count() — count prunes every output column (and
      // with them per-row projection work and final sorts), so it
      // under-measures exactly the keys whose cost IS the projection
      // (the Bench round-9 fix; q_pii read 0.25s under count, 3.3s
      // real). Row count comes from a cheap accumulator instead.
      val acc = spark.sparkContext.longAccumulator("rows")
      fn(spark, sfDir).foreach(_ => acc.add(1))
      println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (${acc.value} rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
