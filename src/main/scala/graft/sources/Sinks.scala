package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY.md §2.1 S5-S8). The reference's only
  * sink is SQLite (analyzer.rs:146-346); the distributed equivalents:
  *
  *  - parquet (primary, columnar, pushdown-capable) — plain and
  *    hive-partitioned;
  *  - csv / json (interchange);
  *  - bucketed tables (`bucketBy` + `saveAsTable`) — the co-located
  *    join path: two tables bucketed on the same key join with ZERO
  *    exchange on either side (asserted in SinksSpec);
  *  - JDBC (the literal SQLite analog) is expressed but not runnable
  *    here — no JDBC driver jar ships in this container; the writer
  *    config is the documented shape.
  *
  * At 100 TB: hive-partition on a low-cardinality pruning column
  * (e.g. event date) so queries touch only matching directories;
  * bucket on the high-cardinality join key so repeated joins skip the
  * shuffle entirely.
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

  /** The JDBC sink shape (SQLite parity, S5/S7). Not invocable in this
    * container (no driver jar); kept as the documented writer config.
    */
  def jdbcWriter(df: DataFrame, url: String, table: String) =
    df.write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)           // e.g. jdbc:sqlite:/path/repositories.db
      .option("dbtable", table)
      .option("batchsize", 1000)    // the reference batches one tx per repo
}
