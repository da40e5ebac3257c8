package graft.etl

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full ETL (analyzer.rs:203-352) as a Spark job:
  * driver-side directory scan → parallel per-repo `git log` extraction
  * (mapPartitions over the repo work-list — the executor-boundary
  * analog of one tokio task per repo, analyzer.rs:222-230) → DataFrame
  * normalization (author-map broadcast lookup, URL rewrite, explode)
  * → three parquet tables.
  *
  * Deviations from the reference, by design (SURVEY.md §7.3):
  *  - surrogate keys are deterministic (dense_rank over repo name), not
  *    SQLite AUTOINCREMENT (analyzer.rs:152) — AUTOINCREMENT has no
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
      nChangedFiles: Long)

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
      maxDepth: Int = 1): EtlReport = {
    val (etl, report) = dataframes(spark, root, config, maxDepth)
    etl("repositories").write.mode("overwrite").parquet(s"$outDir/repositories.parquet")
    etl("logs").write.mode("overwrite").parquet(s"$outDir/logs.parquet")
    etl("changed_files").write.mode("overwrite").parquet(s"$outDir/changed_files.parquet")
    etl("logs_raw").unpersist() // extraction cache released after the writes
    report
  }

  /** Build the three output DataFrames without writing. */
  def dataframes(
      spark: SparkSession,
      root: Path,
      config: EtlConfig,
      maxDepth: Int): (Map[String, DataFrame], EtlReport) = {
    import spark.implicits._

    val (candidates, ignored) = GitLogSource.scanDirectories(root, maxDepth, config.ignoredRepositories)

    // Cheap validation pass on the driver (HEAD resolution only, no
    // history reads): splits the work-list into extractable repos and
    // the failure report — the reference's silent skip (analyzer.rs:351)
    // surfaced as data.
    val validated = candidates.map(p => p -> GitLogSource.validateRepo(p))
    val failed    = validated.collect { case (p, Some(e)) => p.toString -> e }.toMap // path-keyed: basenames can collide
    val okPaths   = validated.collect { case (p, None) => p.toString }
    val analyzed  = okPaths.map(p => Paths.get(p).getFileName.toString).sorted

    // One task per repository (the reference's task-per-repo fanout,
    // analyzer.rs:222-230), but STREAMING: git log output is parsed
    // line-by-line, so executor memory per repo is O(one commit), not
    // O(history) — the reference holds each repo's full history in a
    // Vec (repository.rs:114,185), its main scale hazard.
    val commits = spark
      .createDataset(okPaths)
      .repartition(math.max(1, okPaths.size))
      .mapPartitions(_.flatMap(p => GitLogSource.streamRepo(Paths.get(p))))

    // Author normalization (J1): broadcast the email→name map and
    // override the *name* only (repository.rs:167-171). A literal
    // MapType rides inside codegen — zero shuffle, like the
    // reference's in-process HashMap.
    //
    // Persisted: the extraction lineage (git subprocess + parse) feeds
    // the report counts AND all three table writes — without caching,
    // every downstream action would re-run `git log` over every repo
    // (~5 full extractions per ETL run). Released in run() after the
    // writes; dataframes() callers can unpersist via the returned map's
    // "logs_raw" entry.
    val authorMapCol = typedLit(config.authorMap)
    val logsRaw = commits.toDF()
      .withColumn("author_name",
        coalesce(element_at(authorMapCol, col("author_email")), col("author_name")))
      .persist()

    // Deterministic surrogate key: dense_rank over (name, path). The
    // repo identity key is the unique repo_path — two checkouts with
    // the same directory basename (root/team1/app, root/team2/app) are
    // distinct repositories and must not merge or duplicate; `name` in
    // the output stays the basename for reference parity.
    val repoWindow = org.apache.spark.sql.expressions.Window.orderBy("name", "path")
    val repoDim = logsRaw
      .select(col("repo_name").as("name"), col("repo_path").as("path"), col("repo_url").as("url"))
      .distinct()
      .withColumn("repo_id", dense_rank().over(repoWindow).cast("long"))

    val repositories = repoDim.select("repo_id", "name", "url")

    val logs = logsRaw
      .join(broadcast(repoDim), logsRaw("repo_path") === repoDim("path"))
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
      .join(broadcast(repoDim), logsRaw("repo_path") === repoDim("path"))
      .select(col("commit_hash"), explode(col("changed_files")).as("file_path"),
        col("repo_id").as("repository_id"))

    val report = EtlReport(
      analyzed = analyzed,
      ignored = ignored,
      failed = failed,
      nLogs = logs.count(),
      nChangedFiles = changedFiles.count())

    (Map(
      "repositories" -> repositories,
      "logs" -> logs,
      "changed_files" -> changedFiles,
      "logs_raw" -> logsRaw), report)
  }
}
