package graft.etl

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full ETL (analyzer.rs:203-352) as a Spark job:
  * driver-side directory scan → one distributed pass per repo doing
  * validation + remote-url lookup + `git log` extraction (mapPartitions
  * over the repo work-list — the executor-boundary analog of one tokio
  * task per repo, analyzer.rs:222-230) → DataFrame normalization
  * (author-map broadcast lookup, URL rewrite, explode) → three parquet
  * tables.
  *
  * Deviations from the reference, by design (SURVEY.md §7.3):
  *  - surrogate keys are deterministic (dense_rank over (name, path)),
  *    not SQLite AUTOINCREMENT (analyzer.rs:152) — AUTOINCREMENT has no
  *    stable distributed analog;
  *  - the logs "primary key" is (repository_id, commit_hash), not a
  *    global commit_hash PK, so forks sharing commits don't silently
  *    drop whole repositories (the reference's `.ok()` swallow at
  *    analyzer.rs:351 + global PK at analyzer.rs:163);
  *  - failed repos surface in [[EtlReport.failed]] instead of
  *    disappearing.
  */
object GitEtl {

  final case class EtlReport(
      analyzed: Seq[String],
      ignored: Seq[String],
      failed: Map[String, String],
      nLogs: Long,
      nChangedFiles: Long,
      commitsPerRepo: Seq[(String, Long)] = Nil)

  /** Run the ETL. Tables land as parquet under `outDir`:
    * repositories(repo_id, name, url), logs(commit_hash, parent_hash,
    * author_name, author_email, commit_datetime, commit_epoch, message,
    * insertions, deletions, repository_id), changed_files(commit_hash,
    * file_path) — DDL shapes from analyzer.rs:149-188 with an extra
    * epoch column for engine-neutral comparisons.
    */
  def run(
      spark: SparkSession,
      root: Path,
      outDir: String,
      config: EtlConfig = EtlConfig(),
      maxDepth: Int = 1,
      shardsPerRepo: Int = 1): EtlReport = {
    val etl = dataframes(spark, root, config, maxDepth, shardsPerRepo)
    write(etl, outDir)
    val rep = report(etl) // cheap: reads the still-cached extraction
    etl("events").unpersist() // extraction cache released after writes+report
    rep
  }

  /** Write the three reference tables from a [[dataframes]] map —
    * split out so callers (Main) can materialize the extraction under
    * a progress listener first, then write from cache.
    */
  def write(tables: Map[String, DataFrame], outDir: String): Unit = {
    tables("repositories").write.mode("overwrite").parquet(s"$outDir/repositories.parquet")
    tables("logs").write.mode("overwrite").parquet(s"$outDir/logs.parquet")
    tables("changed_files").write.mode("overwrite").parquet(s"$outDir/changed_files.parquet")
  }

  /** Build the output DataFrames without writing. Triggers NO Spark
    * jobs — callers that want the run report call [[report]] (which
    * does), and should unpersist the "events" entry when finished.
    */
  def dataframes(
      spark: SparkSession,
      root: Path,
      config: EtlConfig,
      maxDepth: Int,
      shardsPerRepo: Int = 1): Map[String, DataFrame] = {
    import spark.implicits._

    val (candidates, ignored) = GitLogSource.scanDirectories(root, maxDepth, config.ignoredRepositories)
    val nShards = math.max(1, shardsPerRepo)

    // One task per repository (the reference's task-per-repo fanout,
    // analyzer.rs:222-230), with ALL per-repo subprocess work —
    // HEAD validation, remote-url lookup, `git log` — inside the task:
    // driver prep is O(1) filesystem metadata per directory, so a
    // 100k-repo work-list doesn't serialize minutes of rev-parse calls
    // before the job starts. Extraction is STREAMING: the -z byte
    // stream is parsed token-by-token, so executor memory per repo is
    // O(one commit), not O(history) — the reference holds each repo's
    // full history in a Vec (repository.rs:114,185), its main scale
    // hazard.
    //
    // Persisted: the one extraction pass feeds the repositories dim,
    // logs, changed_files, AND the failure report — without caching,
    // every downstream action would re-run `git log` over every repo.
    // shardsPerRepo > 1 spreads each history over several tasks (hash-
    // sliced via rev-list + log --stdin) — the giant-repo straggler
    // mitigation; shard 0 carries the repo/error events.
    val work = candidates.flatMap(p => (0 until nShards).map(sh => (p.toString, sh)))
    val events = spark
      .createDataset(work)
      .repartition(math.max(1, work.size))
      .mapPartitions(_.flatMap { case (p, sh) =>
        GitLogSource.extractRepoShard(Paths.get(p), sh, nShards)
      })
      .toDF()
      .persist()

    // Repositories dimension from the VALIDATED WORK-LIST (kind=repo
    // events), not from extracted commits: a repo that validates but
    // yields zero non-merge commits still gets its row, matching the
    // reference's unconditional repository insert (analyzer.rs:299-310)
    // and keeping report.analyzed consistent with the table.
    //
    // Deterministic surrogate key: dense_rank over (name, path). The
    // repo identity key is the unique repo_path — two checkouts with
    // the same directory basename (root/team1/app, root/team2/app) are
    // distinct repositories and must not merge or duplicate; `name` in
    // the output stays the basename for reference parity.
    val repoWindow = org.apache.spark.sql.expressions.Window.orderBy("name", "path")
    val repoDim = events.filter(col("kind") === "repo")
      .select(col("repo_name").as("name"), col("repo_path").as("path"), col("repo_url").as("url"))
      .withColumn("repo_id", dense_rank().over(repoWindow).cast("long"))

    val repositories = repoDim.select("repo_id", "name", "url")

    val (logs, changedFiles) = normalizedTables(events, repoDim, config.authorMap)

    val failures = events.filter(col("kind") === "error")
      .select(col("repo_path").as("path"), col("error"))

    Map(
      "repositories" -> repositories,
      "logs" -> logs,
      "changed_files" -> changedFiles,
      "failures" -> failures,
      "ignored" -> ignored.toDF("name"),
      "events" -> events)
  }

  /** The commit-normalization tail shared by the full-history path
    * above and the incremental path ([[GitEtlIncr]]): author-map
    * override + repo-id attach + per-file explode over any extraction
    * event frame and any (repo_id, path) dimension.
    */
  private[etl] def normalizedTables(
      events: DataFrame, repoDim: DataFrame,
      authorMap: Map[String, String]): (DataFrame, DataFrame) = {
    // Author normalization (J1): broadcast the email→name map and
    // override the *name* only (repository.rs:167-171). A literal
    // MapType rides inside codegen — zero shuffle, like the
    // reference's in-process HashMap.
    val authorMapCol = typedLit(authorMap)
    val logsRaw = events.filter(col("kind") === "commit")
      .select(col("commit.*"))
      .withColumn("author_name",
        coalesce(element_at(authorMapCol, col("author_email")), col("author_name")))
    val dim = repoDim.select(col("repo_id"), col("path"))
    val logs = logsRaw
      .join(broadcast(dim), logsRaw("repo_path") === dim("path"))
      .select(
        col("commit_hash"),
        col("parent_hash"),
        col("author_name"),
        col("author_email"),
        timestamp_seconds(col("commit_epoch")).as("commit_datetime"),
        col("commit_epoch"),
        col("message"),
        col("insertions"),
        col("deletions"),
        col("repo_id").as("repository_id"))
    // repository_id discriminates fork-shared commit hashes, matching
    // the (repository_id, commit_hash) logs key — without it a commit
    // reachable from two repos would double-join per-file rows.
    val changedFiles = logsRaw
      .join(broadcast(dim), logsRaw("repo_path") === dim("path"))
      .select(col("commit_hash"), explode(col("changed_files")).as("file_path"),
        col("repo_id").as("repository_id"))
    (logs, changedFiles)
  }

  /** Materialize the run report from [[dataframes]] output — the one
    * place that triggers jobs (four small actions over the cached
    * extraction; `dataframes` itself stays lazy).
    */
  def report(tables: Map[String, DataFrame]): EtlReport = {
    import org.apache.spark.sql.Row
    // per-repo commit counts from the cached extraction (the
    // reference's per-repo progress lines, rendered post-hoc); right
    // join keeps zero-commit repos with n = 0
    val perRepo = tables("logs")
      .groupBy("repository_id").agg(count(lit(1)).as("n"))
      .join(tables("repositories"),
        col("repository_id") === col("repo_id"), "right")
      .select(col("name"), coalesce(col("n"), lit(0L)).as("n"), col("repo_id"))
      .collect()
      .sortBy(r => (r.getString(0), r.getAs[Long]("repo_id")))
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toSeq
    EtlReport(
      analyzed = tables("repositories").select("name")
        .collect().map(_.getString(0)).toSeq.sorted,
      ignored = tables("ignored").collect().map(_.getString(0)).toSeq,
      failed = tables("failures")
        .collect().map { case Row(p: String, e: String) => p -> e }.toMap,
      nLogs = tables("logs").count(),
      nChangedFiles = tables("changed_files").count(),
      commitsPerRepo = perRepo)
  }
}
