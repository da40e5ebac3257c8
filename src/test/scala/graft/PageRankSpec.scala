package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_pagerank against an independent driver-side integer PageRank
  * over a constructed trading graph, plus structural invariants on
  * the real fixture data.
  */
class PageRankSpec extends AnyFunSuite {
  import TestSpark._

  /** Same fixed-point kernel, computed over an in-memory edge list. */
  private def referencePr(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val n = deg.size.toLong
    var fp: Map[String, Long] = deg.map { case (node, _) => node -> 1000000000000L / n }
    (1 to iters).foreach { _ =>
      val mass = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => fp(src) / deg(src) }.sum
      }
      fp = mass.map { case (node, s) => node -> (150000000000L / n + 85L * s / 100L) }
    }
    fp
  }

  test("q_pagerank equals the independent integer kernel on a constructed graph") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pr").toString
    // orders o1..o4 wire customers {1,2} to suppliers {7,8,9}:
    // c1-{s7,s8}, c2-{s7,s9}; c2's order o4 repeats s7 (distinct must dedup)
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 7L), (2L, 8L), (3L, 9L), (4L, 7L), (3L, 7L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = SparkEntry.queries("q_pagerank")(spark, tmp).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    val want = referencePr(
      Seq("c1" -> "s7", "c1" -> "s8", "c2" -> "s7", "c2" -> "s9"), iters = 3)
    assert(got == want)
    // s7 (deg 2) must outrank the deg-1 suppliers
    assert(got("s7") > got("s8") && got("s7") > got("s9"))
    assert(got("s8") == got("s9"), "symmetric nodes must tie exactly")
  }

  test("directed kernel redistributes dangling mass on a known sink graph") {
    import spark.implicits._
    // a → b, b is a sink. Hand-computed fixed-point after 1 iteration:
    //   r0 = 5e11 each; dang = fp(b) = 5e11; dang share = 5e11 div 2 = 25e10
    //   teleport = 150e9 div 2 = 75e9
    //   a: 75e9 + 85·(0 + 25e10) div 100       = 287_500_000_000
    //   b: 75e9 + 85·(5e11 + 25e10) div 100    = 712_500_000_000
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got1 = graft.queries.GraphOps.directedKernel(edges, iters = 1)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    assert(got1 == Map("a" -> 287500000000L, "b" -> 712500000000L))
    // without redistribution a would hold only the teleport floor and
    // total mass would have leaked b's entire share; with it, this tiny
    // graph conserves mass exactly
    assert(got1.values.sum == 1000000000000L)
    // sinks keep participating across iterations: 3 rounds on a chain
    // with two sinks (x→y, x→z) still sums to ~1.0 up to floor loss
    val got3 = graft.queries.GraphOps.directedKernel(
        Seq(("x", "y"), ("x", "z")).toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    assert(got3.keySet == Set("x", "y", "z"))
    val total = got3.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
    assert(got3("y") == got3("z"), "symmetric sinks must tie exactly")
    assert(got3("y") > got3("x"), "sinks fed by x must outrank the source")
  }

  test("q_pagerank_dir runs on fixture data with every node present and positive") {
    val rows = SparkEntry.queries("q_pagerank_dir")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val sinks = rows.filter(_.getAs[Long]("out_deg") == 0L)
    assert(sinks.nonEmpty, "supplier nodes must appear as sinks")
    rows.foreach(r => assert(r.getAs[Long]("rank_fp") > 0))
  }

  test("q_graph_hops labels minimum hops from the seed suppliers and -1 beyond the horizon") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hops").toString
    // s100 is the only seed (suppkey % 100 == 0). Chain:
    //   s100 -(o1)- c1 -(o2)- s7 -(o3)- c2 -(o4)- s8 -(o5)- c3 -(o6)- s9
    // hops: s100=0, c1=1, s7=2, c2=3, s8=4, and c3/s9 beyond maxHops=4 → -1
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L), (6L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 100L), (2L, 7L), (3L, 7L), (4L, 8L), (5L, 8L), (6L, 9L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = SparkEntry.queries("q_graph_hops")(spark, tmp).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("hop")).toMap
    assert(got == Map("s100" -> 0L, "c1" -> 1L, "s7" -> 2L, "c2" -> 3L,
      "s8" -> 4L, "c3" -> -1L, "s9" -> -1L))
  }

  test("q_pagerank_seeded: teleport flows only to seeds, unreached nodes stay exactly 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("seedpr").toString
    // two components: {s100 - c1} (seeded) and {s7 - c2} (unseeded).
    // nSeeds = 1. Hand-computed (1 iter):
    //   r0: s100 = 1e12, others 0
    //   contrib: c1 gets 1e12 div 1 = 1e12; s100 gets 0 (c1 had 0)
    //   s100: teleport 150e9 + 0                       = 150_000_000_000
    //   c1:   0 + 85·1e12 div 100                      = 850_000_000_000
    //   s7, c2: 0 teleport, 0 contrib                  = 0
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 100L), (2L, 7L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.GraphOps.q_pagerank_seeded(spark, tmp, iters = 1)
      .collect().map(r => r.getAs[String]("node") ->
        ((r.getAs[Boolean]("seed"), r.getAs[Long]("rank_fp")))).toMap
    assert(got == Map(
      "s100" -> ((true, 150000000000L)), "c1" -> ((false, 850000000000L)),
      "s7" -> ((false, 0L)), "c2" -> ((false, 0L))))
  }

  test("triangleCounts matches hand-computed counts on K4 + pendant + isolate-pair") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in C(3,2)=3 triangles), pendant 5-1
    // (deg 1, no triangles), disconnected edge 6-7 (deg 1 each)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L)).toDF("a", "b")
    val got = graft.queries.GraphOps.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          Option(r.getAs[java.lang.Double]("clustering")).map(_.doubleValue)))).toMap
    assert(got(1L) == ((4L, 3L, Some(2.0 * 3 / (4 * 3)))))  // 0.5
    assert(got(2L) == ((3L, 3L, Some(1.0))))
    assert(got(3L) == ((3L, 3L, Some(1.0))))
    assert(got(4L) == ((3L, 3L, Some(1.0))))
    assert(got(5L) == ((1L, 0L, None)))
    assert(got(6L) == ((1L, 0L, None)))
    assert(got(7L) == ((1L, 0L, None)))
    // global count: each K4 triangle counted at exactly 3 corners
    assert(got.values.map(_._2).sum == 3L * 4L)
  }

  test("edgeJaccard matches hand-computed scores on K4 + pendant + isolate-pair") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L)).toDF("a", "b")
    val got = graft.queries.GraphOps.edgeJaccard(edges).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("common"), r.getAs[Long]("jaccard_fp"))))
    // inner K4 edges: common 2 of union 4 -> 0.5; spoke edges:
    // common 2 of union 5 -> 0.4; pendant/isolated: 0
    assert(got.toMap == Map(
      (2L, 3L) -> ((2L, 500000L)), (2L, 4L) -> ((2L, 500000L)), (3L, 4L) -> ((2L, 500000L)),
      (1L, 2L) -> ((2L, 400000L)), (1L, 3L) -> ((2L, 400000L)), (1L, 4L) -> ((2L, 400000L)),
      (1L, 5L) -> ((0L, 0L)), (6L, 7L) -> ((0L, 0L))))
    // deterministic total order: fp DESC, then (a, b)
    assert(got.map(_._1).toSeq == Seq(
      (2L, 3L), (2L, 4L), (3L, 4L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L)))
  }

  test("degreeMixing computes k_nn(k) on K4 + pendant + isolate-pair") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L)).toDF("a", "b")
    val got = graft.queries.GraphOps.degreeMixing(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // deg 1 = {5,6,7}: neighbor degs {4,1,1} -> mean 2
    // deg 3 = {2,3,4}: each sees {4,3,3} -> mean 10/3 (round-half-up)
    // deg 4 = {1}: sees {3,3,3,1} -> mean 2.5
    assert(got.toSeq == Seq(
      (1L, 3L, 2000000L), (3L, 3L, 3333333L), (4L, 1L, 2500000L)))
  }

  test("edgeAdamicAdar weights common neighbors by 1/ln(deg) on the K4 fixture") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L)).toDF("a", "b")
    def term(deg: Long): Long = math.round(1e9 / math.log(deg.toDouble))
    val got = graft.queries.GraphOps.edgeAdamicAdar(edges).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("common"), r.getAs[Long]("aa_fp")))).toMap
    // K4 degrees: node 1 -> 4 (spoke to 5), nodes 2..4 -> 3
    // inner edge (2,3): common {1, 4} -> 1/ln4 + 1/ln3
    assert(got((2L, 3L)) == ((2L, term(4) + term(3))))
    assert(got((2L, 4L)) == ((2L, term(4) + term(3))))
    assert(got((3L, 4L)) == ((2L, term(4) + term(3))))
    // spoke edge (1,2): common {3, 4}, both deg 3
    assert(got((1L, 2L)) == ((2L, 2 * term(3))))
    assert(got((1L, 5L)) == ((0L, 0L)))
    assert(got((6L, 7L)) == ((0L, 0L)))
    // the selectivity weighting: a deg-3 shared neighbor outweighs deg-4
    assert(term(3) > term(4))
  }

  test("q_graph_triangles on fixture data: corner sums ≡ 0 mod 3, bounds hold") {
    val rows = SparkEntry.queries("q_graph_triangles")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val cornerSum = rows.map(_.getAs[Long]("n_tri")).sum
    assert(cornerSum % 3 == 0, "every triangle has exactly 3 corners")
    // exact value is driver-testdata-dependent (oracle-checked
    // instead — pinning it here would break on a regeneration, the
    // round-7 lesson); the graph must be non-degenerate though
    assert(cornerSum > 0, "part co-occurrence graph must contain triangles")
    rows.foreach { r =>
      val deg = r.getAs[Long]("deg")
      val t = r.getAs[Long]("n_tri")
      assert(t <= deg * (deg - 1) / 2, "triangles bounded by wedge count")
      val c = r.getAs[java.lang.Double]("clustering")
      if (deg < 2) assert(c == null)
      else assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("lpaLabels equals an independent synchronous-LPA reference on a bridged-cliques graph") {
    import spark.implicits._
    // two K4 cliques bridged by one edge — LPA must keep them as two
    // communities (a components pass would merge them)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (4L, 10L))
    // independent reference: simultaneous most-frequent-neighbor
    // update, ties to the smallest label
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ref: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      ref = adj.map { case (n, ns) =>
        val freq = ns.groupBy(ref).view.mapValues(_.size).toMap
        n -> freq.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    val got = graft.queries.GraphOps.lpaLabels(edges.toDF("a", "b"), 3)
      .collect().map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("label"), r.getAs[Long]("comm_size")))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (n, l) => assert(got(n)._1 == l, s"node $n label") }
    val sizes = ref.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case (n, (l, cs)) => assert(cs == sizes(l), s"node $n comm_size") }
    // the bridge must not merge the cliques
    assert(ref.filter(_._1 <= 4).values.toSet.intersect(
      ref.filter(_._1 >= 10).values.toSet).isEmpty, "cliques stayed separate")
  }

  test("modularityOf matches a hand-computed Newman Q on the bridged-cliques graph") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (4L, 10L))
    val rows = graft.queries.GraphOps.modularityOf(edges.toDF("a", "b"), 3)
      .collect()
    // LPA keeps the two cliques separate (previous test); each
    // community: 4 nodes, 6 intra edges; degrees 3+3+3+4 = 13; m = 13.
    // term = (4·13·6 − 13²)/(4·13²) = (312 − 169)/676 = 143/676
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 4L)
      assert(r.getAs[Long]("m_intra") == 6L)
      assert(r.getAs[Long]("d_sum") == 13L)
      assert(r.getAs[Long]("term_fp") ==
        (BigInt(143) * 1000000 / 676).toLong)
    }
    // whole-graph sanity on the corpus: every |term| <= 1e6 and the
    // total Q = Σ terms lands in (-1e6, 1e6]
    val corpus = SparkEntry.queries("q_graph_modularity")(spark, TestSpark.sf)
      .collect()
    assert(corpus.nonEmpty)
    val q = corpus.map(_.getAs[Long]("term_fp")).sum
    assert(q > -1000000L && q <= 1000000L, s"total Q_fp $q out of range")
    assert(corpus.map(_.getAs[Long]("m_intra")).sum <=
      corpus.map(_.getAs[Long]("d_sum")).sum / 2)
  }

  test("q_pagerank_copart produces row-identical ranks to the broadcast kernel") {
    val a = SparkEntry.queries("q_pagerank")(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("deg"),
        r.getAs[Long]("rank_fp"), r.getAs[Double]("rank"))).toSeq
    val b = SparkEntry.queries("q_pagerank_copart")(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("deg"),
        r.getAs[Long]("rank_fp"), r.getAs[Double]("rank"))).toSeq
    assert(a.nonEmpty && a == b,
      "physical variant must not change a single rank bit")
  }

  test("q_graph_hops_copart produces row-identical hop labels to the broadcast kernel") {
    val a = SparkEntry.queries("q_graph_hops")(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("hop"))).toSeq
    val b = SparkEntry.queries("q_graph_hops_copart")(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("hop"))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("kcorePeel keeps a planted clique core and peels the pendant chain") {
    import spark.implicits._
    // K5 clique on {1..5} (deg 4) + chain 5-10-11-12 (degs 1-2);
    // k=3: round 1 peels 10,11,12 (and their edges), clique survives
    // with all internal degrees intact
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (clique ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))).toDF("a", "b")
    val got = graft.queries.GraphOps.kcorePeel(edges, k = 3, rounds = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg0"), r.getAs[Long]("deg_final"),
          r.getAs[Boolean]("in_core")))).toMap
    (1L to 4L).foreach(n => assert(got(n) == ((4L, 4L, true)), s"node $n"))
    assert(got(5L) == ((5L, 4L, true)))   // loses only the pendant edge
    assert(got(10L) == ((2L, 0L, false)))
    assert(got(11L) == ((2L, 0L, false)))
    assert(got(12L) == ((1L, 0L, false)))
  }

  test("mass is conserved up to integer-floor loss on fixture data") {
    val rows = SparkEntry.queries("q_pagerank")(spark, TestSpark.sf).collect()
    val n = rows.length
    assert(n > 0)
    val total = rows.map(_.getAs[Long]("rank_fp")).sum
    // each of the 3 iterations floors at most 1 unit per node in the
    // teleport term, per edge in the contribution, and 1 in damping
    assert(total <= 1000000000000L && total > 1000000000000L - 200L * n,
      s"mass $total out of tolerance for $n nodes")
    rows.foreach(r => assert(r.getAs[Long]("rank_fp") > 0))
  }
}
