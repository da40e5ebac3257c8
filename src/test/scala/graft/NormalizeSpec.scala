package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, UnicodeNormalize}
import graft.queries.TextOps

/** Unicode normalization expression + the q_text_normalize /
  * q_lm_bigram / q_sim_recall round-9 keys.
  *
  * The normalization fixtures use genuinely non-ASCII content (the
  * graded corpus is pure ASCII, where NFC is the identity), written
  * as \u escapes so no tool can silently normalize this source file.
  */
class NormalizeSpec extends AnyFunSuite {
  import TestSpark._

  private def evalNorm(s: String, form: String): String =
    UnicodeNormalize(Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType), form)
      .eval(null).asInstanceOf[UTF8String].toString

  test("NFC composes decomposed sequences (interpreted eval)") {
    // e + combining acute -> U+00E9; a + combining diaeresis -> U+00E4
    assert(evalNorm("cafe\u0301", "NFC") == "caf\u00e9")
    assert(evalNorm("la\u0308rm", "NFC") == "l\u00e4rm")
    // already-NFC input passes through unchanged (fast path)
    assert(evalNorm("caf\u00e9 plain ascii", "NFC") == "caf\u00e9 plain ascii")
  }

  test("NFD / NFKC / NFKD forms (no DuckDB counterpart — pinned here)") {
    assert(evalNorm("caf\u00e9", "NFD") == "cafe\u0301")
    // compatibility folding: fi-ligature U+FB01 -> "fi", superscript
    // two U+00B2 -> "2"; canonical NFC leaves both alone
    assert(evalNorm("\ufb01n\u00b2", "NFKC") == "fin2")
    assert(evalNorm("\ufb01n\u00b2", "NFC") == "\ufb01n\u00b2")
    assert(evalNorm("\ufb01 caf\u00e9", "NFKD") == "fi cafe\u0301")
  }

  test("codegen path agrees with interpreted eval and propagates null") {
    TextFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      Some("cafe\u0301 la\u0308rm"), Some("plain"), Some(""), None)
      .toDF("s")
      .select(col("s"), expr("unicode_norm(s, 'NFC')").as("n"),
        expr("unicode_norm(s)").as("n_default"))
    val rows = df.collect()
    assert(rows(0).getString(1) == "caf\u00e9 l\u00e4rm")
    assert(rows(1).getString(1) == "plain")
    assert(rows(2).getString(1) == "")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))
    // 1-arg form defaults to NFC
    assert(rows(0).getString(2) == "caf\u00e9 l\u00e4rm")
  }

  test("unicode_norm rejects unknown and non-literal forms") {
    TextFunctions.register(spark)
    import spark.implicits._
    val df = Seq("x").toDF("s")
    intercept[Exception] {
      df.select(expr("unicode_norm(s, 'NFX')")).collect()
    }
    intercept[Exception] {
      df.select(expr("unicode_norm(s, s)")).collect()
    }
  }

  test("q_text_normalize: composition shortens every doc by exactly 2") {
    val rows = TextOps.q_text_normalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nfc") == r.getAs[Long]("n_raw") - 2,
        s"doc ${r.get(0)}")
      assert(r.getAs[Boolean]("changed"))
      assert(r.getAs[String]("text_nfc").endsWith(" caf\u00e9 l\u00e4rm"))
    }
  }

  test("q_lm_bigram: hand-computed tiny corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bigram-docs").toString
    Seq(
      (0L, Option("a b a"), "en", "src0", 5L),
      (1L, Option("a b"), "en", "src0", 3L),
      (2L, Option("c"), "en", "src0", 1L),
      (3L, Option.empty[String], "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // corpus: bigrams "a b" x2 (d0, d1), "b a" x1 (d0); prefix counts
    // a->2, b->1; vocab {a, b, c} -> V=3
    def lpFp(c12: Long, c1: Long): Long =
      math.round(math.log((c12 + 1).toDouble / (c1 + 3).toDouble) * 1e9)
    val lpAB = lpFp(2, 2) // p = 3/5
    val lpBA = lpFp(1, 1) // p = 2/4

    val rows = TextOps.q_lm_bigram(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 4)
    val d0 = rows(0L)
    assert(d0.getAs[Long]("n_bigrams") == 2)
    val mean0 = (lpAB + lpBA).toDouble / 2 / 1e9
    assert(d0.getAs[Double]("mean_logp") ==
      BigDecimal(mean0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val d1 = rows(1L)
    assert(d1.getAs[Long]("n_bigrams") == 1)
    // single-token and null docs score NULL, rows preserved
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
    assert(rows(3L).isNullAt(1) && rows(3L).isNullAt(2))
  }

  test("q_quality_ablation: planted per-rule failures and internal identities") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ablate-docs").toString
    // 48 words, 8 stopwords: quality = .4*(8/48)+.3*.48+.3 = 0.511 ≥ .45
    val good = "the a of and the a of and " +
      (1 to 40).map(i => s"w$i").mkString(" ")                           // passes all
    val short = "the a of and w1"                                        // fails min_length only
    val nostop = (1 to 30).map(i => s"w$i").mkString(" ")                // fails stopwords (+quality)
    val dup = "the a of and " + Seq.fill(40)("x").mkString(" ")          // fails dup_words
    Seq(
      (0L, Option(good)), (1L, Option(good)),
      (2L, Option(short)),
      (3L, Option(nostop)),
      (4L, Option(dup)),
      (5L, Option.empty[String]))                                        // null fails all
      .map { case (id, t) => (id, t, "en", "src0", t.map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q_quality_ablation(spark, tmp).collect()
      .map(r => r.getAs[String]("rule") -> r).toMap
    assert(rows.keySet == Set("min_length", "stopwords", "dup_words", "quality"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 6)
      assert(r.getAs[Long]("n_fail_alone") <= r.getAs[Long]("n_fail"))
      // passing the other rules splits exactly into pass-all vs fail-only-this
      assert(r.getAs[Long]("survivors_without_rule") -
        r.getAs[Long]("survivors_all") == r.getAs[Long]("n_fail_alone"))
    }
    assert(rows("min_length").getAs[Long]("n_fail_alone") == 1) // doc 2
    assert(rows("dup_words").getAs[Long]("n_fail") >= 1)        // doc 4 (+null)
    assert(rows.values.head.getAs[Long]("survivors_all") == 2)  // docs 0, 1
  }

  test("q_collocations: planted collocation tops PMI, hand-checked") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("colloc-docs").toString
    // "new york" always together (8x); filler words pair randomly-ish
    val doc = "new york is a city a is new york is a a is new york " +
      "new york a is new york is new york a new york"
    Seq((0L, doc), (1L, "a is a is a is a is a is a is"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q_collocations(spark, tmp, minCount = 5, topN = 10).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getAs[String]("bigram") == "new york",
      s"expected 'new york' on top, got ${top.getAs[String]("bigram")}")
    // hand PMI: every "new"-first bigram is "new york" -> c12 == c1
    val c12 = top.getAs[Long]("c12"); val c1 = top.getAs[Long]("c1")
    val c2 = top.getAs[Long]("c2")
    assert(c12 == c1)
    val n = spark.read.parquet(s"$tmp/documents.parquet")
      .select(explode(graft.queries.DedupOps.shinglesN(col("text"), 2,
        fallbackToText = false))).count()
    val pmi = math.round(math.log(c12.toDouble * n / (c1.toDouble * c2)) * 1e9)
    assert(top.getAs[Long]("pmi_fp") == pmi)
  }

  test("q_profile: driver-side recompute agrees column-for-column") {
    val rows = TextOps.q_profile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val docs = graft.Tables.documents(spark, sf).collect()
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == docs.length))
    def check[T](cname: String, get: org.apache.spark.sql.Row => Option[Any]): Unit = {
      val vals = docs.map(get)
      val r = rows(cname)
      assert(r.getAs[Long]("n_nulls") == vals.count(_.isEmpty), cname)
      assert(r.getAs[Long]("n_distinct") == vals.flatten.distinct.length, cname)
    }
    check("doc_id", r => Option(r.getAs[Any]("doc_id")))
    check("text", r => Option(r.getAs[Any]("text")))
    check("lang", r => Option(r.getAs[Any]("lang")))
    check("source", r => Option(r.getAs[Any]("source")))
    check("n_chars", r => Option(r.getAs[Any]("n_chars")))
    // string min/max of a long column renders the numeric extremes
    val ids = docs.map(_.getAs[Long]("doc_id"))
    assert(rows("doc_id").getAs[String]("min_str") == ids.min.toString)
    assert(rows("doc_id").getAs[String]("max_str") == ids.max.toString)
  }

  test("q_substr_runs: planted shared runs localize exactly, maximal") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("runs-docs").toString
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")   // 12-token run
    val shared2 = (1 to 9).map(i => s"t$i").mkString(" ")   // 9-token run
    val docA = s"a1 a2 a3 $shared a4 a5 $shared2 a6 a7"
    val docB = s"b1 $shared b2 b3 b4 b5 b6 $shared2 b7"
    val twin = (1 to 20).map(i => s"z$i").mkString(" ")     // exact dup pair
    Seq((0L, docA), (1L, docB), (2L, twin), (3L, twin),
        (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))                 // unrelated
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.queries.DedupOps.q_substr_runs(TestSpark.spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("a_from"), r.getAs[Long]("b_from"),
        r.getAs[Long]("n_tokens"))).toSet
    // docA/docB: the 12-run at A pos 3 / B pos 1, the 9-run at
    // A pos 17 / B pos 18; the twins: one whole-doc 20-run at 0/0
    assert(rows == Set(
      (0L, 1L, 3L, 1L, 12L),
      (0L, 1L, 17L, 18L, 9L),
      (2L, 3L, 0L, 0L, 20L)), s"got $rows")
  }

  test("q_sim_recall: recall is the exact-vs-IVF intersection, fixed-point") {
    val exact = graft.queries.SimilarityOps.q_sim_topk(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = graft.queries.SimilarityOps.q_sim_ivf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = graft.queries.SimilarityOps.q_sim_recall(spark, sf).collect()
    assert(rows.length == exact.map(_._1).size)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val nExact = r.getAs[Long]("n_exact")
      val nHit = r.getAs[Long]("n_hit")
      assert(nExact == exact.count(_._1 == q))
      assert(nHit == exact.count(p => p._1 == q && ivf(p)))
      assert(r.getAs[Long]("recall_fp") ==
        (2 * nHit * 1000000 + nExact) / (2 * nExact))
    }
    // the index is useful: it finds at least half the truth set overall
    val total = rows.map(_.getAs[Long]("n_hit")).sum.toDouble /
      rows.map(_.getAs[Long]("n_exact")).sum
    assert(total >= 0.5, s"IVF recall collapsed: $total")
  }
}
