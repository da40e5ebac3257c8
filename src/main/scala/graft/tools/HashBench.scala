package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch measurement: md5 oracle forms vs xxhash64 scale twins
  * (signatures / simhashes), so the "swap in at scale" advice carries
  * a number. `runMain graft.tools.HashBench [n] [sfDir]`.
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 4
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup; NonFatal only — an OOM here must surface
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    import graft.queries.DedupOps
    import org.apache.spark.sql.functions.col
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "minhash_md5" -> (() => graft.SparkEntry.queries("q_minhash")(spark, sfDir)),
      "minhash_xxh64" -> (() => DedupOps.signaturesFast(spark, sfDir).orderBy("doc_id")),
      "simhash_md5" -> (() => graft.SparkEntry.queries("q_simhash")(spark, sfDir)),
      "simhash_xxh64" -> (() => DedupOps.simhashesFast(spark, sfDir).orderBy(col("doc_id")))
    )
    variants.foreach { case (name, mk) =>
      val secs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-14s cold=${secs.head}%.2fs warm=${secs.tail.map(s => f"$s%.2f").mkString(",")}s")
    }
    spark.stop()
  }
}
