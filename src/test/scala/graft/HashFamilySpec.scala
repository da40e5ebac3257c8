package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{DedupOps, HashFamily}

/** The md5 (oracle) and xxhash64 (scale) hash families must produce
  * the SAME pair decisions on decision-unambiguous inputs — exact
  * duplicates collide under any hash function (identical shingle sets
  * → identical minhash signatures; identical word sets → identical
  * simhash), and clearly-distinct documents share no bands. Signature
  * VALUES differ by design; what a caller switching
  * `spark.graft.hashFamily` for throughput must be able to rely on is
  * the decisions. Near-threshold pairs are excluded deliberately:
  * LSH recall is probabilistic in the hash draw, so families may
  * legitimately disagree there.
  */
class HashFamilySpec extends AnyFunSuite {
  import TestSpark._

  // 4 exact-duplicate groups + distinct filler docs with disjoint
  // vocabularies (no shared 3-gram shingles, far-apart word sets)
  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hashfam-docs").toString
    def doc(seed: Int): String =
      (0 until 40).map(i => s"w${seed}_$i").mkString(" ")
    val dups = Seq(
      (0L, doc(100)), (1L, doc(100)),            // pair (0,1)
      (2L, doc(200)), (3L, doc(200)), (4L, doc(200)), // pairs (2,3),(2,4),(3,4)
      (5L, doc(300)), (6L, doc(300)),            // pair (5,6)
      (7L, doc(400)), (8L, doc(400)))            // pair (7,8)
    val filler = (20L until 40L).map(i => (i, doc(i.toInt)))
    (dups ++ filler)
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val expectedPairs = Set(
    (0L, 1L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L), (7L, 8L))

  test("minhash-LSH pair decisions are identical across hash families") {
    val byFamily = Seq(HashFamily.Md5, HashFamily.Xxh64).map { fam =>
      DedupOps.dedupMinhash(spark, dir, fam).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("jaccard"))).toSet
    }
    assert(byFamily.head.map(p => (p._1, p._2)) == expectedPairs)
    // full-row equality: the confirm jaccard is computed from raw
    // text, so surfaced pairs carry identical values in both families
    assert(byFamily.head == byFamily.last)
  }

  test("simhash banded pair decisions are identical across hash families") {
    val byFamily = Seq(HashFamily.Md5, HashFamily.Xxh64).map { fam =>
      DedupOps.simhashPairs(spark, dir, 1, fam).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("hamming"))).toSet
    }
    // exact duplicates: hamming 0 in BOTH families (identical word
    // sets hash identically whatever the function)
    assert(byFamily.head == byFamily.last)
    assert(byFamily.head.map(p => (p._1, p._2)) == expectedPairs)
    assert(byFamily.head.forall(_._3 == 0L))
  }

  test("hashFamily conf switch reaches the public queries") {
    try {
      spark.conf.set("spark.graft.hashFamily", "xxh64")
      val fast = SparkEntry.queries("q_dedup_minhash")(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(fast == expectedPairs)
    } finally spark.conf.unset("spark.graft.hashFamily")
    val oracle = SparkEntry.queries("q_dedup_minhash")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(oracle == expectedPairs)
  }

  test("q_minhash_calib: exact duplicates calibrate perfectly; bounds hold") {
    val rows = DedupOps.q_minhash_calib(TestSpark.spark, dir).collect()
    val byPair = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // every planted exact-dup pair is surfaced and perfectly calibrated:
    // identical shingle sets give identical signatures (8/8 agreement)
    // and exact jaccard 1.0 — error exactly 0
    expectedPairs.foreach { p =>
      val r = byPair.getOrElse(p, fail(s"pair $p not surfaced"))
      assert(r.getAs[Long]("n_agree") == 8L)
      assert(r.getAs[Long]("est_jaccard_fp") == 1000000L)
      assert(r.getAs[Long]("exact_jaccard_fp") == 1000000L)
      assert(r.getAs[Long]("err_fp") == 0L)
    }
    // global invariants: agreement in [0,8], both jaccards in [0,1e6],
    // est derived exactly, err is their difference
    rows.foreach { r =>
      val na = r.getAs[Long]("n_agree")
      assert(na >= 0L && na <= 8L)
      assert(r.getAs[Long]("est_jaccard_fp") == na * 125000L)
      val ex = r.getAs[Long]("exact_jaccard_fp")
      assert(ex >= 0L && ex <= 1000000L)
      assert(r.getAs[Long]("err_fp") == na * 125000L - ex)
    }
  }

  test("q_dedup_agreement: exact dups agree across families; flags consistent") {
    val rows = DedupOps.q_dedup_agreement(TestSpark.spark, dir).collect()
    val byPair = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // exact duplicates are caught by BOTH families (identical shingle
    // sets -> minhash bands collide; identical word sets -> hamming 0)
    expectedPairs.foreach { p =>
      val r = byPair.getOrElse(p, fail(s"pair $p missing"))
      assert(r.getAs[Boolean]("in_minhash") && r.getAs[Boolean]("in_simhash"))
      assert(r.getAs[Double]("jaccard") == 1.0)
      assert(r.getAs[Long]("hamming") == 0L)
    }
    // flag/score consistency on every row
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_minhash") || r.getAs[Boolean]("in_simhash"))
      assert(r.getAs[Boolean]("in_minhash") != r.isNullAt(r.fieldIndex("jaccard")))
      assert(r.getAs[Boolean]("in_simhash") != r.isNullAt(r.fieldIndex("hamming")))
    }
  }

  test("unknown hashFamily value fails loudly") {
    try {
      spark.conf.set("spark.graft.hashFamily", "murmur3")
      intercept[IllegalArgumentException] {
        HashFamily.fromConf(spark)
      }
    } finally spark.conf.unset("spark.graft.hashFamily")
  }

  test("q_source_overlap: planted within/cross-source dup pairs land on the right cells") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("srcovl").toString
    def doc(seed: Int): String =
      (0 until 40).map(i => s"w${seed}_$i").mkString(" ")
    Seq(
      (0L, doc(100), "srcA"), (1L, doc(100), "srcB"), // cross-source dup
      (2L, doc(200), "srcC"), (3L, doc(200), "srcC"), // within-source dup
      (4L, doc(300), "srcA"), (5L, doc(999), "srcB")) // unique docs
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_source_overlap")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_pairs"))).toSet
    assert(got == Set(("srcA", "srcB", 1L), ("srcC", "srcC", 1L)))
    // corpus reconciliation: matrix total == confirmed pair count
    val confirmed = SparkEntry.queries("q_dedup_minhash")(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5).count()
    val matrix = SparkEntry.queries("q_source_overlap")(spark, TestSpark.sf)
      .collect()
    assert(matrix.map(_.getAs[Long]("n_pairs")).sum == confirmed)
    matrix.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }

  test("allPairsOf: equals driver-side brute force over every doc pair (exactness)") {
    import spark.implicits._
    def words(seed: Int, n: Int) = (0 until n).map(i => s"w${seed}_$i")
    val fixture: Seq[(Long, String)] = Seq(
      0L -> words(0, 40).mkString(" "),
      1L -> words(0, 40).mkString(" "),                   // exact dup of 0
      2L -> (words(0, 30) ++ words(9, 10)).mkString(" "), // near-dup, J≈0.58
      3L -> words(3, 40).mkString(" "),                   // disjoint
      4L -> words(4, 5).mkString(" "),                    // tiny, disjoint
      5L -> "a b",                                        // <3 words: excluded
      6L -> null)
    val out = DedupOps.allPairsOf(fixture.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Long]("j_fp"))).toMap
    // brute force: every qualifying pair, exact integer jaccard
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = fixture.collect {
      case (id, t) if t != null && t.split(" ").length >= 3 => id -> sh(t)
    }
    val expected = (for {
      (ida, sa) <- sets; (idb, sb) <- sets if ida < idb
      inter = (sa & sb).size
      if 3 * inter >= sa.size + sb.size
    } yield {
      val u = BigInt(sa.size + sb.size - inter)
      (ida, idb) -> (inter.toLong, sa.size.toLong, sb.size.toLong,
        ((BigInt(2) * inter * 1000000 + u) / (u * 2)).toLong)
    }).toMap
    assert(out == expected)
    assert(expected.contains((0L, 1L)) && expected((0L, 1L))._4 == 1000000L)
    assert(expected.contains((0L, 2L)) && expected.contains((1L, 2L)))
    assert(expected.size == 3) // and nothing across disjoint vocabularies
  }

  test("q_dedup_allpairs covers every LSH-confirmed J>=0.5 pair on the corpus") {
    val ap = SparkEntry.queries("q_dedup_allpairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("j_fp")).toMap
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
    assert(lsh.nonEmpty, "corpus-era guard: expected near-dup pairs at sf0.001")
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(ap.contains(k), s"LSH pair $k missing from exact all-pairs")
      assert(math.abs(ap(k) / 1e6 - r.getAs[Double]("jaccard")) <= 1e-6)
    }
  }
}
