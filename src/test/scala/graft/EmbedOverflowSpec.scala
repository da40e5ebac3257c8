package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-overflow pinning for the covariance-moment family
  * (q_embed_cov / q_pca_power / q_pca_project): 8,192 two-dim vectors
  * at the corpus value scale push every moment product
  * (n·s_ij, s_i·s_j, nd·s2, s²) past 2⁶³, where the pre-round-13
  * all-long spelling silently wrapped (Spark integer overflow is not
  * an error with ANSI off). The decimal(38,0) widening must
  * reproduce the exact BigInt ground truth computed driver-side.
  */
class EmbedOverflowSpec extends AnyFunSuite {
  import TestSpark._

  private val n = 8192
  private def xv(k: Int): Float = if (k % 2 == 0) 0.58f else 0.52f
  private def yv(k: Int): Float = if (k % 3 == 0) 0.56f else 0.50f
  private def q(v: Float): BigInt =
    BigInt(math.floor(v.toDouble * 1e6 + 0.5).toLong)

  // exact BigInt moments of the planted fixture
  private lazy val qs: Seq[(BigInt, BigInt)] =
    (0 until n).map(k => (q(xv(k)), q(yv(k))))
  private def sI(sel: ((BigInt, BigInt)) => BigInt): BigInt = qs.map(sel).sum
  private def sIJ(a: ((BigInt, BigInt)) => BigInt,
                  b: ((BigInt, BigInt)) => BigInt): BigInt =
    qs.map(p => a(p) * b(p)).sum
  // truncate-toward-zero with the implementations' sign separation
  private def tdiv(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) num / den else -((-num) / den)

  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("covflow").toString
    (0 until n).map(k => (k.toLong, Array(xv(k), yv(k)), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def cellTruth(i: Int, j: Int): (BigInt, BigInt, BigInt, BigInt) = {
    val sel = Seq[((BigInt, BigInt)) => BigInt](_._1, _._2)
    val (si, sj) = (sI(sel(i)), sI(sel(j)))
    val sij = sIJ(sel(i), sel(j))
    val num = BigInt(n) * sij - si * sj
    (sij, si, sj, num)
  }

  test("the fixture actually exercises the widened path: products exceed int64") {
    val (_, si, sj, num) = cellTruth(0, 1)
    assert(si * sj > BigInt(Long.MaxValue),
      "s_i*s_j must wrap the old long spelling")
    assert((BigInt(n) * sIJ(_._1, _._1)) > BigInt(Long.MaxValue),
      "n*s_ij must wrap the old long spelling")
    assert(num.abs < BigInt(10).pow(38), "and still fit decimal(38,0)")
  }

  test("q_embed_cov matches exact BigInt truth past the int64 product ceiling") {
    val rows = graft.queries.EmbedOps.q_embed_cov(spark, dir).collect()
    assert(rows.length == 3) // (0,0) (0,1) (1,1)
    val got = rows.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("s_ij"),
        r.getAs[Long]("cov_fp12"), r.getAs[Double]("corr")))).toMap
    def vnum(i: Int): BigInt = {
      val (sii, si, _, _) = cellTruth(i, i)
      BigInt(n) * sii - si * si
    }
    for (i <- 0 to 1; j <- i to 1) {
      val (sij, _, _, num) = cellTruth(i, j)
      val expCov = tdiv(num, BigInt(n) * BigInt(n))
      val expCorr = BigDecimal(
        num.toDouble / (math.sqrt(vnum(i).toDouble) * math.sqrt(vnum(j).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gsij, gcov, gcorr) = got((i.toLong, j.toLong))
      assert(gn == n.toLong && gsij == sij.toLong, s"moments ($i,$j)")
      assert(gcov == expCov.toLong, s"cov_fp12 ($i,$j): got $gcov want $expCov")
      assert(gcorr == expCorr, s"corr ($i,$j): got $gcorr want $expCorr")
    }
  }

  test("q_pca_power replays the exact BigInt power iteration on the widened matrix") {
    val rows = graft.queries.EmbedOps.q_pca_power(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("v_fp"), r.getAs[Long]("lambda_fp")))).toMap
    // driver-side replay: m = num div (n^2 * 1e6), 8 max-normalized steps
    val den = BigInt(n) * BigInt(n) * BigInt(1000000)
    val m = Array.tabulate(2, 2)((i, j) => tdiv(cellTruth(
      math.min(i, j), math.max(i, j))._4, den))
    var v = Array(BigInt(100000), BigInt(100000))
    var mx = BigInt(0)
    (1 to 8).foreach { _ =>
      val w = Array(m(0)(0) * v(0) + m(0)(1) * v(1),
        m(1)(0) * v(0) + m(1)(1) * v(1))
      mx = w.map(_.abs).max
      v = w.map(x => if (mx > 0) tdiv(x * 100000, mx) else BigInt(0))
    }
    val lambda = (mx / 100000).toLong
    assert(rows(0L) == ((v(0).toLong, lambda)), s"dim 0: ${rows(0L)}")
    assert(rows(1L) == ((v(1).toLong, lambda)), s"dim 1: ${rows(1L)}")
  }

  test("q_pca_project: exact projection dot products and trace-based ev share") {
    val out = graft.queries.EmbedOps.q_pca_project(spark, dir).collect()
    assert(out.length == n)
    // recompute the model exactly as the q_pca_power test does
    val den = BigInt(n) * BigInt(n) * BigInt(1000000)
    val m = Array.tabulate(2, 2)((i, j) => tdiv(cellTruth(
      math.min(i, j), math.max(i, j))._4, den))
    var v = Array(BigInt(100000), BigInt(100000))
    var mx = BigInt(0)
    (1 to 8).foreach { _ =>
      val w = Array(m(0)(0) * v(0) + m(0)(1) * v(1),
        m(1)(0) * v(0) + m(1)(1) * v(1))
      mx = w.map(_.abs).max
      v = w.map(x => if (mx > 0) tdiv(x * 100000, mx) else BigInt(0))
    }
    val lambda = mx / 100000
    val trace = m(0)(0) + m(1)(1)
    val expShare = ((2 * lambda * 1000000 + trace) / (2 * trace)).toLong
    out.foreach { r =>
      val k = r.getAs[Long]("vec_id").toInt
      val expProj = (q(xv(k)) * v(0) + q(yv(k)) * v(1)).toLong
      assert(r.getAs[Long]("proj_fp") == expProj, s"proj vec $k")
      assert(r.getAs[Long]("lambda_fp") == lambda.toLong)
      assert(r.getAs[Long]("ev_share_fp") == expShare)
    }
  }
}
