package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (the output of the
  * MinHash/SimHash LSH family) into connected components, so the
  * pipeline can keep one canonical document per cluster. This is the
  * step that makes pair generation actionable at corpus scale — "A~B,
  * B~C" must collapse to one cluster {A,B,C} even though (A,C) was
  * never emitted as a pair.
  *
  * The algorithm is alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each
  * round is two hash-aggregations and two joins — NO unbounded
  * per-node neighbor collection (the naive "collect neighborhood,
  * relabel" approach holds a high-degree node's whole neighborhood in
  * one aggregation state; a boilerplate dup-cluster of 10M documents
  * would OOM it). Converges in O(log² n) rounds to a star forest whose
  * centers are the component minima; near-dup graphs (dense clusters,
  * tiny diameter) converge in 2-3 rounds.
  *
  * Each round's edge set is CHECKPOINTED (localCheckpoint), not
  * merely persisted: every round references the previous edge set
  * several times (the symmetrized union alone doubles it), so without
  * plan truncation the logical plan GROWS EXPONENTIALLY across rounds
  * — by round ~10 merely formatting the plan string OOMs the driver,
  * long before any data size matters. A persist caches row data but
  * leaves the analyzed plan nested; a checkpoint replaces the plan
  * with a leaf. On a cluster the equivalent is `checkpoint()` to
  * reliable storage (localCheckpoint trades executor-loss tolerance
  * for speed — fine in a single JVM); superseded checkpoint RDDs are
  * freed by the ContextCleaner once unreferenced.
  */
object ClusterOps {

  /** Connected components over an undirected edge list. Returns one
    * row per node that appears in an edge: (node, label) where label
    * is the component's minimum node id. The result is materialized
    * (localCheckpoint) so callers get a shallow plan — the iterative
    * lineage is not replayed per downstream action — and all loop
    * intermediates are unpersisted before returning (the checkpointed
    * result itself is freed by the ContextCleaner when the DataFrame
    * is garbage-collected).
    */
  def connectedComponents(
      edges: DataFrame, a: String, b: String, maxIter: Int = 25): DataFrame = {
    // Per-round invariant checksum: (count, sum(hi), sum(lo)). Both
    // sides of the convergence test are DISTINCT edge sets, so equal
    // checksums make set inequality a hash collision — vanishingly
    // rare — and the exact `except` (a full shuffle-heavy anti-join)
    // only runs to CONFIRM an equality the checksums already suggest.
    // Unequal checksums prove inequality outright, so non-final rounds
    // pay one aggregate instead of count + except.
    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("hi"), sum("lo")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    // normalize: (hi, lo) with hi > lo, self-loops dropped, distinct
    var cur = edges
      .select(col(a).cast("long").as("p"), col(b).cast("long").as("q"))
      .filter(col("p") =!= col("q"))
      .select(greatest(col("p"), col("q")).as("hi"), least(col("p"), col("q")).as("lo"))
      .distinct()
      .localCheckpoint(true)
    var curSum = checksum(cur)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // large-star: every node u connects its strictly-larger
      // neighbors to the minimum of its closed neighborhood. The
      // per-node minimum is a plain hash-agg (bounded state), joined
      // back — never a neighborhood collection.
      val sym = cur.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(cur.select(col("lo").as("u"), col("hi").as("v")))
      val minsL = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(minsL, "u")
        .filter(col("v") > col("u")) // v > u >= m, so (v, m) stays normalized
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star: every node connects its smaller neighbors (and
      // itself) to the minimum among them. Edges are already directed
      // hi -> lo, so the smaller neighborhood of `hi` is its lo-set.
      val minsS = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val joined = ls.join(minsS, "hi")
      val next = joined.select(col("hi"), col("m").as("lo"))
        .unionAll(joined.filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(true) // truncate lineage: see scaladoc
      val nextSum = checksum(next)
      // both sides are distinct sets: equal checksums + empty
      // one-sided difference <=> set equality (exact, on checkpointed
      // data); differing checksums skip the except entirely
      converged = nextSum == curSum && next.except(cur).isEmpty
      cur = next
      curSum = nextSum
      it += 1
    }
    // star forest: every edge points a member at its component min.
    // If maxIter exhausted before convergence, cur may NOT be a star
    // forest yet (a node can still carry edges to several provisional
    // minima) — without the defensive min below, a caller's join on
    // `node` would silently duplicate rows. Warn loudly and resolve
    // each node to its smallest label; near-dup graphs converge in
    // 2-3 rounds so this path indicates maxIter was set far too low.
    if (!converged)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"connectedComponents: not converged after $maxIter rounds; " +
          "labels resolved defensively via min() and may not be component minima")
    cur.select(col("hi").as("node"), col("lo").as("label"))
      .unionAll(cur.select(col("lo").as("node"), col("lo").as("label")))
      .groupBy("node").agg(min(col("label")).as("label"))
      .localCheckpoint(true) // shallow plan for callers
  }

  /** Declared query: duplicate clusters of the `documents` table from
    * banded SimHash near-dup pairs (hamming <= 1). Every document gets
    * a cluster id (the cluster's minimum doc_id — singletons label
    * themselves) and its cluster's size; `doc_id == cluster_id` marks
    * the canonical representative a dedup pass would keep.
    *
    * Scale shape: pair generation is the banded-LSH path (one vote
    * pass, capped buckets), the component loop is star-contraction
    * with bounded aggregation state, and the final size/labels joins
    * shuffle O(docs) rows of two longs. Nothing holds a cluster in
    * one buffer.
    */
  def q_dup_clusters(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.simhashPairs(s, d).select(col("doc_a"), col("doc_b"))
    val labels = connectedComponents(pairs, "doc_a", "doc_b")
    val base = documents(s, d).select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
    // sizes via a count window, not groupBy+join: `base` (a documents
    // scan + labels join) is consumed ONCE — Spark has no cross-branch
    // CSE, so the agg/join form would run the scan and join twice per
    // action. One shuffle on cluster_id either way; window partitions
    // are true cluster sizes (bounded by the largest dup cluster, the
    // same ceiling every dedup consumer already accepts).
    base.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }
}
