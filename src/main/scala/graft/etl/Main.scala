package graft.etl

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's interface (main.rs:5,
  * analyzer.rs:32-62): a user of `git-log-to-sqlite <root> --database
  * repositories.db --config config.toml --num-threads 8` runs
  *
  *   runMain graft.etl.Main <root> --out /path/tables \
  *     [--config config.toml] [--max-depth 1] [--recursive] \
  *     [--num-threads N] [--clear]
  *
  * and gets the same three tables as parquet (SQLite → parquet is the
  * one interface change; the JDBC writer shape in graft.sources.Sinks
  * covers the literal .db target where a driver is available). The
  * report output mirrors main.rs:7-26: elapsed seconds, analyzed
  * repositories, skipped directories.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.etl.Main <root> --out <dir> [--config <toml>] " +
          "[--max-depth N] [--recursive] [--shards N] [--num-threads N] " +
          "[--incremental] [--clear]\n" +
          "       (--database is accepted as an alias for --out, matching the reference CLI;\n" +
          "        --incremental appends only new commits since the last run's recorded\n" +
          "        heads to snapshot-versioned tables under --out)")
      sys.exit(2)
    }
    val root = Paths.get(args(0))
    var out = "git-tables"
    var configPath: Option[String] = None
    var maxDepth = 1
    var maxDepthSet = false
    var recursive = false
    var shards = 1 // >1 spreads giant repos over several tasks
    var threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    var incremental = false
    var clear = false
    var i = 1
    def value(flag: String): String = {
      if (i + 1 >= args.length) {
        System.err.println(s"$flag requires a value"); sys.exit(2)
      }
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--out"         => out = value("--out"); i += 2
        // reference flag name (analyzer.rs:32-62): same meaning, the
        // target is a table directory here rather than a .db file
        case "--database"    => out = value("--database"); i += 2
        case "--config"      => configPath = Some(value("--config")); i += 2
        case "--max-depth"   => maxDepth = value("--max-depth").toInt; maxDepthSet = true; i += 2
        case "--recursive"   => recursive = true; i += 1 // analyzer.rs:32-62 parity
        case "--shards"      => shards = value("--shards").toInt; i += 2
        case "--num-threads" => threads = value("--num-threads").toInt; i += 2
        case "--incremental" => incremental = true; i += 1 // since-snapshot mode
        case "--clear"       => clear = true; i += 1 // parquet overwrite is implicit
        case other => System.err.println(s"unknown arg: $other"); sys.exit(2)
      }
    }
    // --recursive without an explicit --max-depth means "no bound",
    // like the reference; with one, --max-depth caps the recursion
    if (recursive && !maxDepthSet) maxDepth = Int.MaxValue

    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-git-etl")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // analyzer.rs:53-54, 137-144 parity: explicit --config fails loudly
    // when missing; no --config picks up ./config.toml if present
    val config = EtlConfig.resolve(configPath.map(Paths.get(_)))
    val t0 = System.nanoTime()

    if (incremental) {
      // since-snapshot mode: only new commits extract; tables are the
      // snapshot-versioned manifest-log layout (GitEtlIncr scaladoc)
      val rep = GitEtlIncr.run(spark, root, out, config, maxDepth)
      val secs = (System.nanoTime() - t0) / 1e9
      val byMode = rep.modes.groupBy(_._2).view.mapValues(_.size).toMap
      println(f"# Done in $secs%.1f seconds (incremental -> logs version ${rep.logsVersion})")
      println("# Repos by mode: " + Seq("full", "since", "noop", "rewind")
        .flatMap(m => byMode.get(m).map(n => s"$m=$n")).mkString(", "))
      if (rep.failed.nonEmpty)
        println(s"# Skipped (${rep.failed.size}): ${rep.failed.keys.toSeq.sorted.mkString(", ")}")
      println(s"# batch: ${rep.batchLogs} log rows, ${rep.batchFiles} changed-file rows -> $out")
      spark.stop()
      return
    }

    val tables = GitEtl.dataframes(spark, root, config, maxDepth, shards)
    // Live progress during the long pole (the reference's per-repo
    // bars, analyzer.rs:282): one Spark task = one (repo, shard), so
    // the extraction job's task-end stream IS per-repo completion.
    // The extraction is materialized here under a scoped listener
    // (count() fills the persist; the writes below read the cache),
    // then per-repo commit counts still print post-hoc — task
    // completion order is not repo order, and a faithful ticker
    // reports progress, not sequence.
    val nTasks = tables("events").rdd.getNumPartitions
    val done = new java.util.concurrent.atomic.AtomicInteger
    val extractStage = new java.util.concurrent.atomic.AtomicInteger(-1)
    val ourStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val progress = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // scope to OUR count() jobs (job group set below) so a
        // concurrently-running job can't be misattributed. AQE may
        // split the count into several jobs, and a job's declared
        // stageInfos can include stages that never run tasks
        // (skipped/cached parents) — so collect the candidate set here
        // and let the first real task-end pick the extraction stage:
        // extraction is upstream of the count-agg, so its tasks finish
        // first within the group.
        if (e.properties != null &&
            "graft-extract" == e.properties.getProperty("spark.jobGroup.id"))
          e.stageInfos.foreach(si => ourStages.add(si.stageId))
      }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        // successful ends only: failed/speculative attempts would
        // overshoot the k/nTasks display and print the newline early
        if (!ourStages.contains(e.stageId) ||
          e.taskInfo == null || !e.taskInfo.successful) return
        extractStage.compareAndSet(-1, e.stageId)
        if (e.stageId != extractStage.get()) return
        val k = done.incrementAndGet()
        if (k <= nTasks) {
          System.err.print(s"\r# extracting: $k/$nTasks repo tasks")
          if (k == nTasks) System.err.println()
        }
      }
    }
    spark.sparkContext.addSparkListener(progress)
    spark.sparkContext.setJobGroup("graft-extract", "git extraction progress")
    try tables("events").count()
    finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(progress)
    }
    GitEtl.write(tables, out)
    val report = GitEtl.report(tables)
    tables("events").unpersist()
    val secs = (System.nanoTime() - t0) / 1e9

    // Report format mirrors the reference (main.rs:7-26), plus per-repo
    // commit counts (the reference's per-repo progress lines,
    // analyzer.rs:282, rendered post-hoc — Spark tasks complete out of
    // order, so a faithful live ticker would interleave misleadingly).
    println(f"# Done in $secs%.1f seconds")
    println(s"# Analyzed repositories (${report.analyzed.size}): ${report.analyzed.mkString(", ")}")
    report.commitsPerRepo.foreach { case (name, n) => println(s"#   $name: $n commits") }
    if (report.ignored.nonEmpty)
      println(s"# Ignored (${report.ignored.size}): ${report.ignored.mkString(", ")}")
    if (report.failed.nonEmpty)
      println(s"# Skipped (${report.failed.size}): ${report.failed.keys.toSeq.sorted.mkString(", ")}")
    println(s"# logs: ${report.nLogs} rows, changed_files: ${report.nChangedFiles} rows -> $out")
    spark.stop()
  }
}
