package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[ClusterOps]]'s connected
  * components. No analog in the reference (its only graph is the
  * commit DAG, walked sequentially — repository.rs); at corpus scale
  * the same shapes rank documents in a similarity/overlap graph.
  */
object GraphOps {

  /** PageRank (damping 0.85, fixed iteration count) over the
    * UNDIRECTED customer↔supplier trading graph: an edge per distinct
    * (custkey, suppkey) pair observed in orders⋈lineitem.
    * Undirectedness gives every node outdegree ≥ 1, so there is no
    * dangling-mass term and every node receives mass each round —
    * the degenerate-free shape to verify the iteration kernel under.
    *
    * Distributed shape: edge extraction is the only corpus-sized work
    * (one shuffle join + distinct); the edge set (with source degree
    * attached once) is then materialized via `localCheckpoint` — the
    * [[ClusterOps]] stance: each of the K iterations references it,
    * and plan truncation keeps iteration k's lineage one join+agg
    * deep instead of stacking all k (`checkpoint()` to reliable
    * storage on a real cluster). Each iteration is one shuffle join
    * (rank table × edges on src — both hash-partitioned on the join
    * key, so AQE reuses the layout) and one map-side-combined sum on
    * dst. Nothing data-sized ever reaches the driver.
    *
    * Oracle parity: ranks are fixed-point longs (1e12 = rank 1.0) and
    * EVERY operation is integer arithmetic — contribution = `fp div
    * deg` (exact), mass sum = long sum (associative), teleport =
    * `150000000000 div N`, damping = `(85·s) div 100` — so both
    * engines carry bit-identical longs through all K iterations; a
    * float PageRank would hit the §5.3 summation-order trap on the
    * very first round. Positive operands make Spark's truncating
    * `div` and DuckDB's flooring `//` agree everywhere.
    */
  def q_pagerank(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val e0 = orders(s, d).join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, "src").localCheckpoint()
    val nDf = deg.agg(count(lit(1)).as("n_nodes"))
    var ranks = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"), expr("1000000000000 div n_nodes").as("fp"))
    (1 to iters).foreach { _ =>
      val contrib = edgesD.join(ranks, edgesD("src") === ranks("node"))
        .select(col("dst"), expr("fp div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("mass"))
      ranks = contrib.crossJoin(broadcast(nDf))
        .select(col("dst").as("node"),
          expr("(150000000000 div n_nodes) + ((85 * mass) div 100)").as("fp"))
    }
    // display rank: ONE correctly-rounded IEEE division on exact
    // operands — bit-identical cross-engine. A round(x, 10) here
    // would flake: fp values genuinely populate the .5 tie at digit
    // 10, where Spark (HALF_UP) and DuckDB (half-even) disagree.
    ranks.join(deg, ranks("node") === deg("src"))
      .select(col("node"), col("deg"), col("fp").as("rank_fp"),
        (col("fp").cast("double") / 1e12).as("rank"))
      .orderBy("node")
  }
}
