package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the embedding utility operators
  * (graft.queries.EmbedOps); exact values are DuckDB-oracle-checked.
  */
class EmbedSpec extends AnyFunSuite {
  import TestSpark._

  test("q_embed_stats: positive norms, extrema ordered, fixed dim") {
    val rows = SparkEntry.queries("q_embed_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64L)
      assert(r.getAs[Double]("l2_norm") > 0.0)
      assert(r.getAs[Double]("max_val") >= r.getAs[Double]("min_val"))
    }
  }

  test("q_embed_quant: symmetric int8 range with the extreme element hitting ±127") {
    val rows = SparkEntry.queries("q_embed_quant")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Long]("q")) <= 127L))
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    byVec.values.foreach { vs =>
      assert(vs.map(v => math.abs(v.getAs[Long]("q"))).max == 127L)
    }
  }

  test("q_embed_calib matches a driver-side per-dimension reference exactly") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(_.getSeq[Float](1)).filter(_ != null)
    val rows = SparkEntry.queries("q_embed_calib")(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val dim = r.getAs[Long]("dim").toInt
      val vs = vecs.flatMap(v => if (dim < v.length) Some(v(dim).toDouble) else None)
      assert(r.getAs[Long]("n") == vs.length)
      val fx = vs.map(v => math.floor(v * 1e6 + 0.5).toLong)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("mean") == r6(fx.map(BigInt(_)).sum.toDouble / vs.length / 1e6))
      val n = vs.length.toLong
      val sx = fx.map(BigInt(_)).sum; val sxx = fx.map(x => BigInt(x) * BigInt(x)).sum
      val std = math.sqrt((BigInt(n) * sxx - sx * sx).toDouble / (n * (n - 1))) / 1e6
      assert(r.getAs[Double]("std") == r6(std))
      assert(r.getAs[Double]("min_val") == vs.min && r.getAs[Double]("max_val") == vs.max)
      val maxAbs = math.max(math.abs(vs.min), math.abs(vs.max))
      assert(r.getAs[Double]("scale") == r6(127.0 / maxAbs))
    }
  }

  test("q_embed_centroid: k*dim cells, group sizes sum to the bounded window") {
    val rows = SparkEntry.queries("q_embed_centroid")(spark, sf).collect()
    assert(rows.length == 8 * 64)
    val total = rows.filter(_.getAs[Long]("dim") == 0L).map(_.getAs[Long]("n")).sum
    val window = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 256).count()
    assert(total == window)
  }

  test("kmeans: Lloyd iterations do not degrade within-cluster cosine, assignment is total") {
    import org.apache.spark.sql.functions.col
    val s = spark
    val vecs = Tables.embeddings(s, sf)
    val k = 8
    def init = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val d0 = queries.KMeansOps.distortion(s, vecs, init)
    val c1 = queries.KMeansOps.lloydStep(vecs, init)
    val d1 = queries.KMeansOps.distortion(s, vecs, c1)
    assert(d1 >= d0 - 1e-9, s"one Lloyd step degraded cosine: $d0 -> $d1")
    val assigned = queries.KMeansOps.kmeans(s, vecs, k, 2).collect()
    assert(assigned.length == vecs.count(), "every vector must be assigned")
    val cells = assigned.map(_.getAs[Long]("cell")).distinct
    assert(cells.length > 1 && cells.forall(c => c >= 0 && c < k))
  }

  test("centroidsAvg matches the ordered-fold kernel within 1e-9 on the same input") {
    import org.apache.spark.sql.functions.col
    val bounded = Tables.embeddings(spark, sf).filter(col("vec_id") < 256)
    val fast = queries.EmbedOps.centroidsAvg(bounded, 8).collect()
      .map(r => ((r.getAs[Long]("cell"), r.getAs[Long]("dim")),
        (r.getAs[Double]("centroid"), r.getAs[Long]("n")))).toMap
    val kernel = SparkEntry.queries("q_embed_centroid")(spark, sf).collect()
    assert(kernel.length == fast.size)
    kernel.foreach { r =>
      val (c, n) = fast((r.getAs[Long]("cell"), r.getAs[Long]("dim")))
      assert(n == r.getAs[Long]("n"))
      assert(math.abs(c - r.getAs[Double]("centroid")) <= 1e-9)
    }
  }

  test("q_dedup_semantic: planted near-dups drop to their lowest-id representative") {
    import spark.implicits._
    // two orthogonal clusters; 2/3 near-dup v0, 4/5 near-dup v1;
    // 6 sits in v0's cell but below the cosine threshold
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0.999f, 0.01f, 0f, 0f),
      3L -> Array(0.998f, 0.02f, 0f, 0f),
      4L -> Array(0.01f, 0.999f, 0f, 0f),
      5L -> Array(0.02f, 0.998f, 0f, 0f),
      6L -> Array(0.7f, 0.1f, 0.7f, 0f))
    val tmp = java.nio.file.Files.createTempDirectory("semdedup").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.SimilarityOps
      .q_dedup_semantic(spark, tmp, k = 2, tau = 0.9)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("n_dups"),
          r.getAs[Long]("rep_id"), r.getAs[Boolean]("kept")))).toMap
    assert(got(0L) == ((0L, 0L, 0L, true)))
    assert(got(1L) == ((1L, 0L, 1L, true)))
    assert(got(2L) == ((0L, 1L, 0L, false)))   // near-dup of 0
    assert(got(3L) == ((0L, 2L, 0L, false)))   // near-dup of 0 AND 2
    assert(got(4L) == ((1L, 1L, 1L, false)))
    assert(got(5L) == ((1L, 2L, 1L, false)))
    assert(got(6L)._1 == 0L && got(6L)._4, "cell-0 member below tau stays kept")
    // structural invariants on the real corpus: kept ⟺ no lower-id
    // partner; representatives never exceed their member's id
    val real = SparkEntry.queries("q_dedup_semantic")(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Boolean]("kept") == (r.getAs[Long]("n_dups") == 0L))
      assert(r.getAs[Long]("rep_id") <= r.getAs[Long]("vec_id"))
      assert((r.getAs[Long]("rep_id") == r.getAs[Long]("vec_id")) ==
        r.getAs[Boolean]("kept"))
    }
    assert(real.exists(!_.getAs[Boolean]("kept")), "corpus has semantic near-dups")
  }

  test("q_embed_rp: driver-side reference projection matches exactly; JL ratios concentrate") {
    import graft.queries.EmbedOps
    // exact cross-check: recompute q / p_j / norms from the same
    // pinned sign matrix on the collected vectors
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .filter(v => v._2 != null && v._2.length == 64).toMap
    val rows = SparkEntry.queries("q_embed_rp")(spark, sf).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val q = v.map(x => math.floor(x.toDouble * 10000.0 + 0.5).toLong)
      val norm2 = q.map(x => x * x).sum
      val proj2 = (0 until EmbedOps.RpOutDims).map { j =>
        val p = q.indices.map(i => q(i) * EmbedOps.rpSigns(i)(j)).sum
        p * p
      }.sum
      assert(r.getAs[Long]("norm2") == norm2)
      assert(r.getAs[Long]("proj2") == proj2)
      if (norm2 > 0)
        assert(r.getAs[Long]("ratio_fp") ==
          (2L * proj2 * 1000000L + 16L * norm2) / (2L * 16L * norm2))
    }
    // JL concentration: the median squared-norm ratio sits near 1
    val ratios = rows.filter(!_.isNullAt(3)).map(_.getAs[Long]("ratio_fp")).sorted
    val med = ratios(ratios.length / 2)
    assert(med > 500000L && med < 2000000L, s"median ratio_fp $med")
  }

  test("q_silhouette: scores the q_embed_train model; bounds, totals, and direction hold") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_silhouette")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // cells are exactly the training assignment's surviving cells,
    // and per-cell counts match the assignment
    val train = SparkEntry.queries("q_embed_train")(spark, TestSpark.sf).collect()
    val counts = train.groupBy(_.getAs[Long]("cell")).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("cell")).toSet == counts.keySet)
    var total = 0L
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      val n = r.getAs[Long]("n_vecs")
      assert(n == counts(cell), s"cell $cell size")
      total += n
      // silhouette is bounded: |mean| <= 1e6, |sum| <= n * 1e6
      assert(math.abs(r.getAs[Long]("mean_sil_fp")) <= 1000000L)
      assert(math.abs(r.getAs[Long]("sum_sil_fp")) <= n * 1000000L)
      // mean is the sign-separated truncating division of the sum
      val sum = r.getAs[Long]("sum_sil_fp")
      val expMean = if (sum >= 0) sum / n else -((-sum) / n)
      assert(r.getAs[Long]("mean_sil_fp") == expMean)
    }
    val window = Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") < 256).count()
    assert(total == window, "every window vector is scored exactly once")
    // a trained clustering on real data separates at least somewhat:
    // the overall mean silhouette must be positive
    val overall = rows.map(_.getAs[Long]("sum_sil_fp")).sum
    assert(overall > 0L, s"overall silhouette sum $overall not positive")
  }

  test("q_prune_proto: scores the q_embed_train model; ranks and cutoffs replay driver-side") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_prune_proto")(spark, TestSpark.sf).collect()
    val window = Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") < 256).count()
    assert(rows.length.toLong == window, "every window vector scored once")
    // cell assignment and quantized cosine agree with the training key
    // (same kernel, same argmax — cos_fp is the x1e6 form of the
    // trained key's round-6 cosine)
    val train = SparkEntry.queries("q_embed_train")(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cell"), r.getAs[Double]("cosine"))).toMap
    rows.foreach { r =>
      val (tCell, tCos) = train(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("cell") == tCell)
      assert(r.getAs[Long]("cos_fp") == math.floor(tCos * 1e6 + 0.5).toLong)
    }
    // within each cell: ranks are a permutation of 1..n_cell ordered by
    // (cos_fp DESC, vec_id), and pruned is the integer cross-multiplied
    // 30% cutoff — exactly floor(0.3 * n_cell) members pruned per cell
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (cell, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_.getAs[Long]("n_cell") == n), s"cell $cell n_cell")
      val sorted = rs.sortBy(r => (-r.getAs[Long]("cos_fp"), r.getAs[Long]("vec_id")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("rnk") == i + 1L, s"cell $cell rank order")
        assert(r.getAs[Boolean]("pruned") == ((i + 1L) * 1000 <= n * 300))
      }
      assert(sorted.count(_.getAs[Boolean]("pruned")) == (n * 300) / 1000,
        s"cell $cell pruned count")
    }
  }

  test("q_kcenter: replays the greedy farthest-point selection exactly; radii non-increasing") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_kcenter")(spark, TestSpark.sf).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(rows.length == 8)
    // independent driver-side replay on the quantized grid
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .filter(col("embedding").isNotNull)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray)
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector(vecs.head)
    var expect = Vector((1L, vecs.head._1, 0L))
    (2 to 8).foreach { step =>
      val cand = vecs.filter(v => !centers.exists(_._1 == v._1))
        .map { case (id, q) => (id, centers.map(c => d2(c._2, q)).min) }
      val (id, r) = cand.minBy { case (id, r) => (-r, id) }
      centers :+= ((id, vecs.find(_._1 == id).get._2))
      expect :+= ((step.toLong, id, r))
    }
    assert(rows.map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
      r.getAs[Long]("radius_d2"))).toVector == expect)
    // covering radius never increases as centers are added
    expect.drop(1).map(_._3).sliding(2).foreach {
      case Vector(a, b) => assert(b <= a)
      case _ => ()
    }
    // selections are distinct vectors
    assert(expect.map(_._2).distinct.length == 8)
  }

  test("q_pca_power replays the 8 integer iterations exactly; result is a dominant direction") {
    val rows = SparkEntry.queries("q_pca_power")(spark, TestSpark.sf).collect()
    assert(rows.length == 64)
    // driver-side exact replay from the raw vectors: same quantization,
    // same sign-separated truncating divisions, same K=8 unroll
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(v =>
        math.floor(v.toDouble * 1e6 + 0.5).toLong))
    val n = vecs.length.toLong
    val dims = 64
    val s = Array.tabulate(dims)(i => vecs.map(_(i)).sum)
    def m(i: Int, j: Int): Long = {
      val sij = vecs.map(v => v(i) * v(j)).sum
      val num = BigInt(n) * sij - BigInt(s(i)) * s(j)
      val den = BigInt(n) * n * 1000000L
      (if (num >= 0) num / den else -((-num) / den)).toLong
    }
    val mat = Array.tabulate(dims, dims)((i, j) => m(i, j))
    var v = Array.fill(dims)(100000L)
    var mx = 0L
    (1 to 8).foreach { _ =>
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => mat(i)(j) * v(j)).sum)
      mx = w.map(math.abs).max
      v = w.map(wi =>
        if (mx == 0L) 0L
        else if (wi >= 0) wi * 100000L / mx
        else -((-wi) * 100000L / mx))
    }
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt
      assert(r.getAs[Long]("v_fp") == v(d), s"v_fp dim $d")
      assert(r.getAs[Long]("lambda_fp") == mx / 100000L)
    }
    // the direction is genuinely dominant: max-normalized (some |v|
    // hits 1e5) and its Rayleigh quotient is positive
    assert(v.map(math.abs).max == 100000L)
    assert(mx / 100000L > 0L, "dominant covariance eigenvalue must be positive")
  }

  test("q_pca_project: exact dot products with the trained direction; share bounded") {
    val direction = SparkEntry.queries("q_pca_power")(spark, TestSpark.sf).collect()
    val v = direction.sortBy(_.getAs[Long]("dim")).map(_.getAs[Long]("v_fp"))
    val lambda = direction.head.getAs[Long]("lambda_fp")
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray.map(x =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong)).toMap
    val rows = SparkEntry.queries("q_pca_project")(spark, TestSpark.sf).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val q = vecs(r.getAs[Long]("vec_id"))
      val proj = q.indices.map(i => q(i) * v(i)).sum
      assert(r.getAs[Long]("proj_fp") == proj)
      assert(r.getAs[Long]("lambda_fp") == lambda)
      val share = r.getAs[Long]("ev_share_fp")
      assert(share > 0L && share <= 1000000L, s"ev share $share")
    }
    // the dominant direction carries variance: projections genuinely spread
    val ps = rows.map(_.getAs[Long]("proj_fp"))
    assert(ps.distinct.length > 1)
  }

  test("q_embed_cov equals a driver-side moment recompute; diagonal corr is 1") {
    val rows = SparkEntry.queries("q_embed_cov")(spark, TestSpark.sf).collect()
    assert(rows.length == 64 * 65 / 2)
    // independent recompute from the raw vectors
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(v =>
        math.floor(v.toDouble * 1e6 + 0.5).toLong))
    val n = vecs.length.toLong
    val dims = 64
    val s = Array.tabulate(dims)(i => vecs.map(_(i)).sum)
    val s2 = Array.tabulate(dims)(i => vecs.map(v => v(i) * v(i)).sum)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      assert(r.getAs[Long]("n") == n)
      val sij = vecs.map(v => v(i) * v(j)).sum
      assert(r.getAs[Long]("s_ij") == sij)
      val num = BigInt(n) * sij - BigInt(s(i)) * s(j)
      val cov = if (num >= 0) num / (n * n) else -((-num) / (n * n))
      assert(r.getAs[Long]("cov_fp12") == cov.toLong, s"cov cell ($i,$j)")
      if (i == j) {
        val vn = n * s2(i) - s(i) * s(i)
        if (vn > 0) assert(r.getAs[Double]("corr") == 1.0, s"diag ($i,$i)")
      }
    }
  }

  test("q_knn_graph: driver-side exact recompute on a fixture; mutuality is consistent on the corpus") {
    import spark.implicits._
    // two tight clusters + one outlier: knn structure is unambiguous
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> Array(0f, 0f, 0f, 0f),
      1L -> Array(0.01f, 0f, 0f, 0f),
      2L -> Array(0f, 0.02f, 0f, 0f),
      3L -> Array(1f, 1f, 1f, 1f),
      4L -> Array(1f, 1f, 1f, 0.99f),
      5L -> Array(-5f, 4f, 3f, -2f))
    val tmp = java.nio.file.Files.createTempDirectory("knng").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    def q(v: Float): Long = math.floor(v.toDouble * 1e6 + 0.5).toLong
    def d2(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) => val dd = q(x) - q(y); dd * dd }.sum
    val expected = vecs.flatMap { case (id, v) =>
      vecs.filter(_._1 != id)
        .map { case (oid, ov) => (d2(v, ov), oid) }.sorted.take(4).zipWithIndex
        .map { case ((dist, oid), i) => (id, i + 1L, oid, dist) }
    }.toSet
    val expEdges = expected.map(e => (e._1, e._3))
    val got = graft.queries.SimilarityOps.q_knn_graph(spark, tmp).collect()
    assert(got.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("nn_id"), r.getAs[Long]("d2"))).toSet == expected)
    got.foreach { r =>
      val fwd = (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_id"))
      assert(r.getAs[Boolean]("mutual") == expEdges.contains(fwd.swap),
        s"mutual flag wrong for $fwd")
    }
    // real corpus: contiguous ranks, monotone d2, symmetric mutuality
    val rows = SparkEntry.queries("q_knn_graph")(spark, sf).collect()
    assert(rows.nonEmpty)
    val edgeSet = rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_id"))).toSet
    rows.groupBy(_.getAs[Long]("vec_id")).values.foreach { es =>
      val sorted = es.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      assert(sorted.map(_.getAs[Long]("d2")).toSeq.sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)), "d2 not monotone in rank")
    }
    rows.foreach { r =>
      val e = (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_id"))
      assert(r.getAs[Boolean]("mutual") == edgeSet.contains(e.swap))
    }
    // both flag values occur: the mutual-kNN subgraph is a real cut
    assert(rows.exists(_.getAs[Boolean]("mutual")) &&
      rows.exists(!_.getAs[Boolean]("mutual")), "mutual flag is constant")
  }

  test("q_knn_graph_ivf: exact distances on shared edges; recall against the exact graph") {
    val exact = SparkEntry.queries("q_knn_graph")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_id")) ->
        r.getAs[Long]("d2")).toMap
    val ivf = SparkEntry.queries("q_knn_graph_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    // candidate generation is approximate, SCORING is not: every ivf
    // edge that the exact graph also has must carry the identical d2
    var shared = 0
    ivf.foreach { r =>
      val e = (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_id"))
      exact.get(e).foreach { d =>
        shared += 1
        assert(r.getAs[Long]("d2") == d, s"d2 diverged on shared edge $e")
      }
    }
    val recall = shared.toDouble / exact.size
    // measured 0.49/0.50/0.51 at sf0.001/0.01/0.1: the synthetic
    // corpus is near-uniform (no cluster structure), which bounds any
    // cell-probing ANN — still ~2x the 25% random-baseline of probing
    // nprobe/K = 4/16 cells, so the coarse quantizer carries signal
    assert(recall >= 0.4, f"IVF recall $recall%.2f below floor vs exact kNN graph")
    assert(recall < 1.0 + 1e-9, "recall bookkeeping broken")
    // per-query structure holds in the bucketed variant too
    ivf.groupBy(_.getAs[Long]("vec_id")).values.foreach { es =>
      val sorted = es.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
    }
  }
}
