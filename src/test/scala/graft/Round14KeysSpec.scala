package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Hand-fixture pins for the round-14 keys: q_novelty (known shingle
  * ownership), q_ivf_balance (independent Scala recompute of the
  * occupancy/cohesion report), q_select_mmr (independent greedy
  * reference on the same quantized grid). The DuckDB oracle is the
  * cross-engine gate; these pin the SEMANTICS against values a human
  * can check.
  */
class Round14KeysSpec extends AnyFunSuite {
  import TestSpark._

  test("q_novelty: first-occurrence ownership on a planted corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nov-docs").toString
    // doc 0: 3 distinct shingles, all first-seen here (novelty 1).
    // doc 1: exact dup of doc 0 (novelty 0).
    // doc 2: shares one shingle with doc 0 ("a b c"), adds two new
    //        ones -> 2/3 novel.
    // doc 3: null text -> null row. doc 4: short text -> whole-text
    //        fallback shingle, first-seen -> novelty 1.
    Seq[(Long, String, String, String, Long)](
      (0L, "a b c d e", "en", "s", 9L),
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c x y", "en", "s", 9L),
      (3L, null, "en", "s", 0L),
      (4L, "zz", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_novelty")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("n_grams")),
          Option(r.getAs[java.lang.Long]("n_novel")),
          Option(r.getAs[java.lang.Long]("novelty_fp")))).toMap
    assert(got(0L) == ((Some(3L), Some(3L), Some(1000000L))))
    assert(got(1L) == ((Some(3L), Some(0L), Some(0L))))
    assert(got(2L) == ((Some(3L), Some(2L), Some(666667L))))
    assert(got(3L) == ((None, None, None)), "null text must report null")
    assert(got(4L) == ((Some(1L), Some(1L), Some(1000000L))))
  }

  test("q_ivf_balance equals an independent Scala recompute of the assignment report") {
    val rows = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray)
    val cents = rows.filter(_._1 < 16).sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // assignment: max cosine, ties to the smallest cent_id
    val perCell = rows.map { case (_, v) =>
      val scored = cents.map { case (cid, cv) => (cos(v, cv), cid) }
      val best = scored.maxBy { case (c, cid) => (c, -cid.toDouble) }
      (best._2, math.floor(best._1 * 1e6 + 0.5).toLong)
    }.groupBy(_._1).map { case (cell, xs) =>
      cell -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val t = perCell.values.map(_._1).sum
    val mx = perCell.values.map(_._1).max
    val nc = perCell.size.toLong
    val got = graft.queries.SimilarityOps.q_ivf_balance(spark, sf).collect()
    assert(got.length == cents.length, "one row per codebook cell")
    got.foreach { r =>
      val cell = r.getAs[Long]("cell")
      perCell.get(cell) match {
        case Some((n, sc)) =>
          assert(r.getAs[Long]("n") == n, s"cell $cell occupancy")
          assert(r.getAs[Long]("mean_cos_fp") == (2 * sc + n) / (2 * n),
            s"cell $cell cohesion")
          assert(r.getAs[Long]("share_fp") == (2 * n * 1000000L + t) / (2 * t))
        case None =>
          assert(r.getAs[Long]("n") == 0L, s"cell $cell must report empty")
      }
      assert(r.getAs[Long]("imbalance_fp") == (2 * mx * nc * 1000000L + t) / (2 * t))
    }
  }

  test("q_select_mmr equals an independent greedy reference and diverges from relevance top-k") {
    val rows = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray)
    val q = rows.find(_._1 == 0L).get._2
    def cosfp(a: Array[Float], b: Array[Float]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val cand = rows.filter(_._1 > 0L)
    val rel = cand.map { case (id, v) => id -> cosfp(v, q) }.toMap
    val emb = cand.toMap
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    val expect = (1 to 8).map { rank =>
      val best = cand.iterator.filterNot(c => sel.contains(c._1)).map { case (id, v) =>
        val ms = if (sel.isEmpty) None else Some(sel.map(s => cosfp(v, emb(s))).max)
        val score = rel(id) - ms.getOrElse(0L)
        (score, id, ms)
      }.minBy { case (score, id, _) => (-score, id) }
      sel += best._2
      (rank.toLong, best._2, rel(best._2), best._3, best._1)
    }
    val got = graft.queries.SimilarityOps.q_select_mmr(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rel_fp"),
        Option(r.getAs[java.lang.Long]("maxsim_fp")).map(_.longValue),
        r.getAs[Long]("score_fp")))
    assert(got.toSeq == expect,
      s"greedy chain diverged:\n got   ${got.toSeq}\n expect $expect")
    // the diversity term must actually move the selection
    val topRel = cand.sortBy { case (id, _) => (-rel(id), id) }.take(8).map(_._1).toSet
    assert(got.map(_._2).toSet != topRel,
      "MMR selection must differ from pure relevance top-k on this corpus")
  }
}
