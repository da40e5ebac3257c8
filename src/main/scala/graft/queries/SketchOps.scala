package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators (SURVEY.md §2.4 approx family, extended):
  * the 100 TB distinct-counting shape is NOT one global pass — it is
  * per-partition/per-group partial sketches, shuffled as kilobyte
  * binaries and unioned, so a distinct-count over any rollup level
  * reuses the same partials. Spark 4 ships Apache DataSketches HLL
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — no
  * custom code needed, exactly the built-in-first preference.
  *
  * No DuckDB oracle (sketch binaries are engine-specific) — the unit
  * test bounds the estimate against the exact distinct count.
  */
object SketchOps {

  /** Per-nation customer sketches unioned to a global estimate in one
    * extra (tiny) aggregation over sketch binaries — the partial-merge
    * pattern. Output carries per-level exact counts alongside, so the
    * test (and a user) can see the estimate quality.
    */
  def q_sketch_merge(s: SparkSession, d: String): DataFrame = {
    val perNation = customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        hll_sketch_agg(col("c_custkey")).as("sk"),
        countDistinct(col("c_custkey")).as("exact_distinct"))
    // the union aggregates 25 kilobyte-sized binaries — the "reduce"
    // over partials that never rescans the fact table
    val global = perNation.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_distinct"),
      sum(col("exact_distinct")).as("exact_distinct"))
      .select(lit(-1L).as("c_nationkey"),
        col("approx_distinct"), col("exact_distinct"))
    perNation
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        hll_sketch_estimate(col("sk")).as("approx_distinct"),
        col("exact_distinct"))
      .unionAll(global)
      .orderBy("c_nationkey")
  }

  /** Exact twin of [[q_sketch_merge]]'s verified surface: per-nation
    * distinct counts plus the (-1) all-nations row, same shape minus
    * the sketch estimate. This keys the hash-verifiable half of the
    * sketch query to the DuckDB oracle, so the only unverified columns
    * left in the family are the genuinely engine-specific estimates.
    * The global row reuses the partial-merge idea: custkeys are
    * per-nation disjoint, so the union level is a sum over the 25
    * per-nation partials, never a rescan.
    */
  def q_sketch_exact(s: SparkSession, d: String): DataFrame = {
    val perNation = customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_custkey")).as("exact_distinct"))
    val global = perNation
      .agg(sum(col("exact_distinct")).as("exact_distinct"))
      .select(lit(-1L).as("c_nationkey"), col("exact_distinct"))
    perNation
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("exact_distinct"))
      .unionAll(global)
      .orderBy("c_nationkey")
  }
}
