package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-check pins for the round-15 keys (the DuckDB oracle is the
  * cross-engine gate; these pin SEMANTICS against an independent
  * recompute): q_map's AP fold re-derived sequentially from the same
  * click log, and its fixed-point arithmetic on a tiny closed-form
  * case. (q_media_dedup's recall pin lives in MediaCodecSpec; the
  * q_sim_sparse gate in SparseGateSpec.)
  */
class Round15KeysSpec extends AnyFunSuite {
  import TestSpark._

  test("q_map equals a sequential AP recompute over the shared click log") {
    val depth = 20
    val log = graft.queries.TextOps.pbmClicked(spark, sf, depth)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("click")))
    val L = (1 to depth).foldLeft(1L)((l, i) =>
      l / BigInt(l).gcd(BigInt(i)).toLong * i)
    val expected = log.groupBy(_._1).map { case (q, rows) =>
      var hits = 0L
      var apSum = 0L
      rows.sortBy(_._2).foreach { case (_, rank, click) =>
        hits += click
        if (click == 1L) apSum += hits * (L / rank)
      }
      val den = L * depth
      q -> (rows.map(_._3).sum, (2 * apSum * 1000000 + den) / (2 * den))
    }
    val got = graft.queries.TextOps.q_map(spark, sf, depth).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("ap_fp")))).toMap
    assert(got.nonEmpty && got == expected)
    assert(got.values.map(_._2).toSet.size > 1,
      "AP must vary across queries (non-degeneracy)")
  }

  test("q_dim_recall: monotone non-decreasing recall in m, full-dim truth bounded") {
    val rows = graft.queries.SimilarityOps.q_dim_recall(spark, sf).collect()
      .map(r => (r.getAs[Long]("m"), r.getAs[Long]("hits"),
        r.getAs[Long]("total"), r.getAs[Long]("recall_fp")))
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 48L))
    rows.foreach { case (m, hits, total, rf) =>
      assert(hits <= total, s"m=$m")
      assert(rf == (2 * hits * 1000000 + total) / (2 * total), s"m=$m")
    }
    val recalls = rows.sortBy(_._1).map(_._4)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"longer prefixes must not lose recall: ${recalls.mkString(",")}")
    assert(recalls.distinct.size > 1, "curve must vary (non-degeneracy)")
  }

  test("q_map fixed-point arithmetic: closed-form two-hit case") {
    // clicks at ranks 1 and 3 with depth 20:
    // AP = (1/20) * (1/1 + 2/3) = 1/12 -> ap_fp = round(1e6/12) = 83333
    val L = 232792560L
    val apSum = 1L * (L / 1) + 2L * (L / 3)
    val den = L * 20
    assert((2 * apSum * 1000000 + den) / (2 * den) == 83333L)
  }
}
