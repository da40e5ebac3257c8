package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharEntropyFp, TextFunctions}
import graft.queries.TextOps

/** The codegen'd [[CharEntropyFp]] kernel must be BIT-IDENTICAL to the
  * interpreted SQL `aggregate` fold it replaced in q_entropy
  * ([[TextOps.entropyRunFoldSql]]) — the DuckDB oracle was written
  * against the fold, so the kernel inherits its contract only if
  * every long matches, not merely the rounded display entropy.
  */
class EntropyKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def foldOf(texts: Seq[String]): Seq[Long] = {
    texts.toDF("text")
      .select(expr("filter(split(text, ''), c -> c <> '')").as("chs"))
      .select(expr(TextOps.entropyRunFoldSql).as("s"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def kernelOf(texts: Seq[String]): Seq[Long] = {
    TextFunctions.register(spark)
    texts.toDF("text")
      .select(expr("char_entropy_fp(text)").as("s"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("kernel equals the SQL fold on hand fixtures incl. unicode") {
    val texts = Seq(
      "", "a", "aa", "ab", "aab",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "café lärm straße",
      "ééé ́́",           // combining marks as standalone chars
      "mixed 1234 !?;: mixed 1234")
    assert(kernelOf(texts) == foldOf(texts))
  }

  test("kernel equals the SQL fold on random strings (seeded property)") {
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '.', ',', '!', 'é', 'ß', '中', '́')))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val texts = (1 to 60).map(i =>
      textGen.pureApply(Gen.Parameters.default.withSize(80), Seed(i.toLong)))
    assert(kernelOf(texts) == foldOf(texts))
  }

  test("kernel null propagation and direct eval") {
    TextFunctions.register(spark)
    val rows = Seq(Option("abab"), Option(""), Option.empty[String]).toDF("text")
      .select(expr("char_entropy_fp(text)")).collect()
    // "abab": two runs of 2 -> 2 * round(2 ln 2 * 1e12)
    val t2 = java.math.BigDecimal.valueOf(2.0 * math.log(2.0) * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    assert(rows(0).getLong(0) == 2 * t2)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
  }

  test("q_entropy output is unchanged by the kernel swap (sf fixture)") {
    // regression anchor: recompute a few docs' entropy driver-side
    val rows = TextOps.q_entropy(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text"))).toMap
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      docs(id) match {
        case None =>
          assert(r.isNullAt(1) && r.isNullAt(3))
        case Some(t) =>
          assert(r.getAs[Long]("n_chars") == t.codePointCount(0, t.length))
          val uniq = t.codePoints().distinct().count()
          assert(r.getAs[Long]("n_uniq_chars") == uniq)
          if (t.nonEmpty) {
            val n = t.codePointCount(0, t.length).toDouble
            val sFp = CharEntropyFp.fp(
              org.apache.spark.unsafe.types.UTF8String.fromString(t))
            val h = math.log(n) - sFp.toDouble / 1e12 / n
            // BigDecimal.valueOf (shortest-decimal), matching Spark's
            // Round on DoubleType — new BigDecimal(h) would use the
            // exact binary expansion and can differ at boundaries
            val expected = BigDecimal(java.math.BigDecimal.valueOf(h))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
            assert(r.getAs[Double]("char_entropy") == expected)
          }
      }
    }
  }
}
