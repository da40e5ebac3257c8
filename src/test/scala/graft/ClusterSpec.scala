package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** graft.queries.ClusterOps: connected components (alternating
  * large-star/small-star contraction) and the declared
  * q_dup_clusters query; exact values at sf are DuckDB-oracle-checked
  * (recursive min-label propagation over the same simhash pair list).
  */
class ClusterSpec extends AnyFunSuite {
  import TestSpark._
  import graft.queries.ClusterOps

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  // localFinishEdges = 0: exercise the DISTRIBUTED fixed point (the
  // local union-find finish would otherwise absorb these tiny graphs)
  private def labelsOf(df: DataFrame, maxIter: Int = 25): Map[Long, Long] =
    ClusterOps.connectedComponents(df, "a", "b", maxIter, localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain transitivity: A~B, B~C collapses to one component labeled min") {
    val got = labelsOf(edges((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two disjoint components each take their own minimum as label") {
    val got = labelsOf(edges((5L, 6L), (6L, 7L), (10L, 11L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("self-loops and duplicate/reversed edges do not corrupt labels") {
    val got = labelsOf(edges((4L, 4L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    // pure self-loop node 4 is dropped (no real edge); chain collapses
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph (hub 0) and a long path both converge within maxIter") {
    val star = labelsOf(edges((1 to 20).map(i => (0L, i.toLong)): _*))
    assert(star.size == 21 && star.values.forall(_ == 0L))
    // path 0-1-2-...-15: worst case for label propagation, O(log^2 n)
    // rounds for star contraction
    val path = labelsOf(edges((0 until 15).map(i => (i.toLong, i + 1L)): _*))
    assert(path.size == 16 && path.values.forall(_ == 0L))
  }

  test("labels are unique per node even when maxIter exhausts early") {
    // one round cannot finish a 16-node path; the defensive min keeps
    // the contract "one row per node" (labels may not be component
    // minima yet — that is the documented degraded mode)
    val df = ClusterOps.connectedComponents(
      edges((0 until 15).map(i => (i.toLong, i + 1L)): _*), "a", "b",
      maxIter = 1, localFinishEdges = 0)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.length == 16)
  }

  test("driver union-find finish equals the distributed fixed point") {
    // chains, a clique, disjoint pieces, reversed/dup edges — one graph
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 8L), (8L, 7L),
      (20L, 21L), (21L, 22L), (20L, 22L), (40L, 41L), (41L, 40L), (50L, 60L))
    val dist = labelsOf(edges(g: _*)) // localFinishEdges = 0
    val local = ClusterOps.connectedComponents(edges(g: _*), "a", "b",
        localFinishEdges = 1000) // whole graph under the cap
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local(4L) == 1L && local(7L) == 7L && local(22L) == 20L && local(60L) == 50L)
  }

  test("q_dup_clusters: every doc labeled, canonical member present, sizes consistent") {
    val rows = SparkEntry.queries("q_dup_clusters")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = rows.map(_.getAs[Long]("doc_id"))
    assert(docs.distinct.length == docs.length, "one row per doc_id")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      // cluster id is the minimum member => the canonical doc is a member
      assert(members.map(_.getAs[Long]("doc_id")).min == cid)
      // declared size equals actual membership for every member row
      members.foreach(m => assert(m.getAs[Long]("cluster_size") == members.length.toLong))
    }
    // clusters must at least cover the confirmed near-dup pairs
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
    val label = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    pairs.foreach { p =>
      assert(label(p.getAs[Long]("doc_a")) == label(p.getAs[Long]("doc_b")),
        s"pair ${p.getAs[Long]("doc_a")}~${p.getAs[Long]("doc_b")} split across clusters")
    }
  }

  test("random graphs: distributed labels equal a reference union-find (both paths)") {
    // deterministic pseudo-random graphs (fixed seed — reproducible),
    // checked against an independent local union-find
    val rnd = new scala.util.Random(20260813L)
    def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.map(n => n -> find(n)).toMap
    }
    (1 to 5).foreach { trial =>
      val n = 10 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(3 * n)
      val pairs = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val expect = reference(pairs)
        val dist = labelsOf(edges(pairs: _*))
        assert(dist == expect, s"trial $trial (distributed): n=$n m=$m")
        val local = ClusterOps
          .connectedComponents(edges(pairs: _*), "a", "b", localFinishEdges = 100000)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(local == expect, s"trial $trial (local finish): n=$n m=$m")
      }
    }
  }

  test("q_dedup_resolve: exactly the cluster minima survive, drop counts add up") {
    val clusters = SparkEntry.queries("q_dup_clusters")(spark, sf).collect()
    val resolved = SparkEntry.queries("q_dedup_resolve")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_dropped"))).toMap
    val byCluster = clusters.groupBy(_.getAs[Long]("cluster_id"))
    assert(resolved.keySet == byCluster.keySet, "kept set must be the cluster minima")
    byCluster.foreach { case (cid, members) =>
      assert(resolved(cid) == ((members.length.toLong, members.length.toLong - 1)), s"cluster $cid")
    }
    // conservation: kept + dropped == corpus
    assert(resolved.values.map(_._1).sum == clusters.length.toLong)
  }

  test("q_dedup_priority: keeps the longest member per cluster; policy genuinely diverges") {
    val rows = SparkEntry.queries("q_dedup_priority")(spark, sf).collect()
    val clusters = SparkEntry.queries("q_dup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(rows.length == clusters.size, "one decision row per document")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      // the representative is the member maximizing (n_chars, -doc_id)
      val best = members.minBy(r =>
        (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      members.foreach { r =>
        assert(r.getAs[Long]("rep_id") == best.getAs[Long]("doc_id"),
          s"cluster $cid rep")
        assert(r.getAs[Boolean]("kept") ==
          (r.getAs[Long]("doc_id") == best.getAs[Long]("doc_id")))
        // same cluster assignment as q_dup_clusters
        assert(clusters(r.getAs[Long]("doc_id")) == cid)
      }
      assert(members.count(_.getAs[Boolean]("kept")) == 1,
        s"cluster $cid keeps exactly one")
    }
    // measured non-degeneracy (sf0.001: 103 rows diverge): the
    // longest-member policy must actually differ from keep-min-id
    assert(rows.exists(r => r.getAs[Long]("rep_id") != r.getAs[Long]("cluster_id")),
      "keep-longest never diverged from keep-min-id — policy degenerate")
  }
}
