package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Source/sink surface (SURVEY.md §2.1 S5-S8). The reference's only
  * sink is SQLite (analyzer.rs:146-346); the distributed equivalents:
  *
  *  - parquet (primary, columnar, pushdown-capable) — plain and
  *    hive-partitioned;
  *  - csv / json (interchange);
  *  - bucketed tables (`bucketBy` + `saveAsTable`) — the co-located
  *    join path: two tables bucketed on the same key join with ZERO
  *    exchange on either side (asserted in SinksSpec);
  *  - JDBC (the literal SQLite analog) — runnable and round-trip
  *    tested against embedded Derby (the JDBC driver that ships with
  *    Spark); SQLite itself is a url/driver swap away.
  *
  * At 100 TB: hive-partition on a low-cardinality pruning column
  * (e.g. event date) so queries touch only matching directories;
  * bucket on the high-cardinality join key so repeated joins skip the
  * shuffle entirely.
  *
  * Delta Lake (named in BASELINE's "writes to Delta/JDBC" approach
  * line): NOT implemented, deliberately — `delta-spark`/`delta-core`
  * jars are not on this container's classpath (`/opt/spark/jars` has
  * no delta artifacts, checked round 9) and the build resolves no
  * external dependencies. The equivalence story: Delta is parquet
  * plus a transaction log, so every query-side capability here
  * (pushdown, pruning, partitioning) behaves identically on the
  * parquet sinks; the transactional/append contract is covered by
  * the JDBC sink (writeJdbc/writeReferenceDb) and the append-mode
  * fingerprint index. On a cluster with the jars present,
  * `writeDelta` is `df.write.format("delta")` plus the session
  * extension — no structural change to this object.
  */
object Sinks {

  /** Write a DataFrame as date-partitioned parquet (partition pruning
    * demo: filters on `p_date` prune directories before any IO).
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, out: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date")
      .parquet(out)

  def writeCsv(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)

  def readCsv(spark: SparkSession, path: String, schemaDDL: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDDL).csv(path)

  def writeJson(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(out)

  def readJson(spark: SparkSession, path: String, schemaDDL: String): DataFrame =
    spark.read.schema(schemaDDL).json(path)

  /** ORC round-trip — the other columnar format Spark ships natively.
    * Same pushdown/pruning properties as parquet (predicate pushdown,
    * column pruning, per-stripe statistics), so it's a drop-in
    * interchange target for warehouses standardized on ORC.
    */
  def writeOrc(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(out)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Z-order clustered write — the lakehouse `OPTIMIZE ZORDER BY`
    * layout primitive: rows are range-repartitioned and sorted on the
    * Morton interleave of the two key columns, so each output file's
    * min/max statistics are tight in BOTH dimensions and scans with a
    * predicate on either column prune files (a linear sort gives
    * this on the leading key only). The pruning-effectiveness
    * readout over the same curve is
    * [[graft.queries.SampleOps.q_zorder]]; keys are scaled to a
    * fixed 16-bit domain by `max16a`/`max16b` (pass the column
    * maxima, or any stable upper bound — at 100 TB use the catalog
    * stats rather than a scan).
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      max16a: Long, max16b: Long, files: Int, out: String): Unit = {
    val z = graft.queries.SampleOps.zInterleave(
      expr(s"($colA * 65535) div greatest($max16a, 1)"),
      expr(s"($colB * 65535) div greatest($max16b, 1)"))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  /** Persist `df` as a table bucketed (and sorted) on `key` —
    * subsequent equi-joins between tables bucketed identically require
    * no shuffle (SortMergeJoin reads buckets directly).
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Embedded Derby — the one JDBC engine whose driver ships in
    * /opt/spark/jars; the integration-test target for the SQLite-shaped
    * sink below.
    */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Runnable JDBC sink (S5/S7 — the reference's output contract is a
    * local SQLite file, analyzer.rs:146-346). Round-trip-tested against
    * embedded Derby; SQLite is the same call with
    * `url = jdbc:sqlite:/path/repositories.db, driver = org.sqlite.JDBC`
    * once the xerial sqlite-jdbc jar is on the classpath (not
    * resolvable offline in this container — see NOTES.md).
    */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      driver: String = DerbyDriver, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .option("batchsize", 1000)    // the reference batches one tx per repo
    // Derby's Spark dialect maps StringType to CLOB, which Derby then
    // refuses to compare — every pushed-down string filter would error.
    // Create string columns as max-width VARCHAR instead.
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(32672)")
    (if (driver == DerbyDriver && stringCols.nonEmpty)
       w.option("createTableColumnTypes", stringCols.mkString(", "))
     else w).save()
  }

  def readJdbc(
      spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .load()

  /** Materialized fingerprint index — the incremental-dedup companion
    * table a daily-ingest pipeline maintains: one 32-hex-char md5 per
    * DISTINCT normalized fingerprint in the corpus. At 100 TB the
    * index is a small fraction of corpus bytes (16 B of hash vs full
    * text per doc), so re-deriving it every run — what the in-DAG
    * `q_dedup_incr` does for the oracle — re-reads and re-hashes the
    * whole corpus for a batch-sized question. Write this once, append
    * each batch's admitted fingerprints (`SaveMode.Append`), and each
    * increment's cost is O(batch + index scan), never O(corpus).
    * Read path: [[graft.queries.TextOps.dedupIncrAgainst]].
    */
  def writeFpIndex(
      corpus: DataFrame, out: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    corpus.select(graft.queries.TextOps.normalizedFp(col("text")).as("fp"))
      .filter(col("fp").isNotNull).distinct()
      .write.mode(mode).parquet(out)

  def readFpIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a trained BPE merge table ([[graft.queries.BpeOps
    * .q_bpe_train]]'s output: step, lhs, rhs, merged, cnt) — the
    * train-once side of the train-once/encode-often split. The table
    * is MODEL-sized (K rows), so a single parquet file; read back
    * with [[readMergeTable]] and encode via
    * [[graft.queries.BpeOps.encodeWith]].
    */
  def writeMergeTable(mergeTable: DataFrame, out: String): Unit =
    mergeTable.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)

  def readMergeTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a trained unigram-LM tokenizer model
    * ([[graft.queries.UnigramOps.q_unigram_train]]'s output or any
    * (piece, score) table) — the train-once side of the unigram
    * train-once/encode-often split;
    * [[graft.queries.UnigramOps.encodeWithModel]] reads it back and
    * segments a corpus without re-running EM (the
    * [[writeMergeTable]] stance for the BPE family).
    */
  def writeUnigramModel(model: DataFrame, out: String): Unit =
    model.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)

  def readUnigramModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a trained DSIR bucket model ([[graft.queries.SampleOps
    * .dsirModel]]'s output: b, r, t — 1024 rows) — the train-once
    * side of DSIR's train-once/score-often split; the streaming
    * scorer ([[graft.streaming.StreamingOps.streamingDsirScore]])
    * reads it back and scores arriving documents statelessly.
    */
  def writeDsirModel(model: DataFrame, out: String): Unit =
    model.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)

  def readDsirModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The reference's full `.db` contract: repositories / logs /
    * changed_files written into one embedded database
    * (analyzer.rs:146-188). Tables are written single-partition because
    * single-file embedded engines (SQLite, embedded Derby) serialize
    * writers — the reference itself funnels all inserts through one
    * connection; server-backed JDBC targets should call writeJdbc per
    * table with the natural partitioning instead.
    */
  def writeReferenceDb(
      tables: Map[String, DataFrame], url: String,
      driver: String = DerbyDriver): Unit =
    Seq("repositories", "logs", "changed_files").foreach { t =>
      writeJdbc(tables(t).coalesce(1), url, t, driver)
    }

  // ---- snapshot-versioned table (the transaction-log pattern) ----
  //
  // The structural core of Delta's _delta_log (see the Delta note in
  // the object scaladoc), built from the two primitives every
  // filesystem gives us: immutable data files + an atomic manifest
  // rename. Layout:
  //
  //   <dir>/data/v<N>/part-*.parquet   immutable, never rewritten
  //   <dir>/_manifests/v<N>.manifest   newline list of the version's
  //                                    data files (absolute paths)
  //
  // A write stages its parquet under data/v<N>/ first, then COMMITS
  // by moving the manifest into _manifests/ with ATOMIC_MOVE: readers
  // resolve versions from the manifest directory only, so a crashed
  // or in-flight write (data files without a manifest) is invisible —
  // snapshot isolation for a single writer, and readers never see a
  // torn version. "append" manifests carry the previous version's
  // files plus the new ones, so old versions stay readable (time
  // travel) until a retention job deletes their manifests.
  //
  // At 100 TB this is exactly the Delta/Iceberg contract that makes
  // object-store tables safe: list ONE small directory (manifests),
  // read one small file, then open only the named data files — no
  // eventually-consistent directory listing of the data itself.

  private def manifestDir(dir: String) = java.nio.file.Paths.get(dir, "_manifests")

  /** Committed versions, ascending (empty if the table doesn't exist). */
  def snapshotVersions(dir: String): Seq[Long] = {
    val md = manifestDir(dir)
    if (!java.nio.file.Files.isDirectory(md)) Seq.empty
    else {
      val s = java.nio.file.Files.list(md)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Write `df` as the next version of the snapshot table at `dir`;
    * returns the committed version. `overwrite = false` appends: the
    * new manifest names the previous version's files too.
    */
  def writeSnapshot(df: DataFrame, dir: String,
                    overwrite: Boolean = true): Long = {
    val versions = snapshotVersions(dir)
    val next = versions.lastOption.getOrElse(0L) + 1L
    val dataDir = java.nio.file.Paths.get(dir, "data", s"v$next")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val newFiles = {
      val s = java.nio.file.Files.list(dataDir)
      try s.iterator().asScala
        .map(_.toAbsolutePath.toString)
        .filter(_.endsWith(".parquet"))
        .toSeq.sorted
      finally s.close()
    }
    val carried =
      if (overwrite || versions.isEmpty) Seq.empty
      else java.nio.file.Files.readAllLines(
        manifestDir(dir).resolve(s"v${versions.last}.manifest")).asScala.toSeq
    java.nio.file.Files.createDirectories(manifestDir(dir))
    val tmp = manifestDir(dir).resolve(s".v$next.manifest.tmp")
    java.nio.file.Files.writeString(tmp, (carried ++ newFiles).mkString("\n"))
    java.nio.file.Files.move(tmp, manifestDir(dir).resolve(s"v$next.manifest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE) // the commit point
    next
  }

  /** Idempotent per-batch commit for Structured Streaming
    * `foreachBatch` — the Delta txn-id pattern that upgrades
    * at-least-once batch replay to EXACTLY-ONCE file output: the
    * snapshot version is pinned to `batchId + 1`, so a batch replayed
    * after a crash-restart finds its manifest already committed and
    * becomes a no-op (returns false) instead of double-appending.
    * A torn earlier attempt (data staged, no manifest) is restaged
    * with overwrite and only becomes visible at the manifest rename —
    * the same commit point as [[writeSnapshot]]. Batches append:
    * version N's manifest carries version N−1's files.
    *
    * Wire-up: `ds.writeStream.foreachBatch((df, id) =>
    * Sinks.writeSnapshotBatch(df, dir, id)): Unit` — tested in
    * StreamingSpec with an explicit replay.
    */
  def writeSnapshotBatch(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val v = batchId + 1L
    val committed = snapshotVersions(dir)
    if (committed.contains(v)) return false // replayed batch: no-op
    val dataDir = java.nio.file.Paths.get(dir, "data", s"v$v")
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val newFiles = {
      val s = java.nio.file.Files.list(dataDir)
      try s.iterator().asScala
        .map(_.toAbsolutePath.toString)
        .filter(_.endsWith(".parquet"))
        .toSeq.sorted
      finally s.close()
    }
    val carried =
      if (!committed.contains(v - 1)) Seq.empty
      else java.nio.file.Files.readAllLines(
        manifestDir(dir).resolve(s"v${v - 1}.manifest")).asScala.toSeq
    java.nio.file.Files.createDirectories(manifestDir(dir))
    val tmp = manifestDir(dir).resolve(s".v$v.manifest.tmp")
    java.nio.file.Files.writeString(tmp, (carried ++ newFiles).mkString("\n"))
    try {
      java.nio.file.Files.move(tmp, manifestDir(dir).resolve(s"v$v.manifest"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { // lost a commit race: the other writer's manifest stands
      case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp); false
    }
  }

  /** Read a committed version (default: latest) — time travel is
    * `readSnapshot(spark, dir, v)` for any version whose manifest
    * survives. Only manifest-named files are opened; uncommitted
    * data directories are never visible.
    */
  def readSnapshot(spark: SparkSession, dir: String,
                   version: Long = -1L): DataFrame = {
    val versions = snapshotVersions(dir)
    require(versions.nonEmpty, s"no committed snapshot versions at $dir")
    val v = if (version < 0) versions.last else version
    require(versions.contains(v),
      s"version $v not committed at $dir (have ${versions.mkString(",")})")
    val files = java.nio.file.Files.readAllLines(
      manifestDir(dir).resolve(s"v$v.manifest")).asScala.toSeq
      .filter(_.nonEmpty)
    spark.read.parquet(files: _*)
  }
}
