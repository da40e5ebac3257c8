package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table loaders for the driver testdata star schema
  * (TESTDATA.md). Scans are plain `spark.read.parquet` so Catalyst
  * pushes filters/projections into the parquet reader (SURVEY.md §2.1
  * S8); at cluster scale the same call reads a partitioned directory
  * tree, so nothing here assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as a raw nanos long and
    * rebuild a µs timestamp with integral division — `div`, not `/`,
    * because epoch-nanos (~1.7e18) exceeds double's 2^53 exact-integer
    * range and a float division would corrupt low-order digits.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
