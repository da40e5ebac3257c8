package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GramStats, TextFunctions}

/** The codegen'd [[GramStats]] kernel must be BIT-IDENTICAL to the
  * interpreted HOF form it replaced in q_repetition — the DuckDB
  * oracle was written against that form (string_split(' ') keeps
  * empties; grams join with one space; < n words ⇒ zero grams), so
  * the kernel inherits the contract only if every (count, distinct)
  * pair matches, including the whitespace edge cases.
  */
class GramStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The ORIGINAL q_repetition expression form, packed the same way. */
  private def oldPacked(g: Column): Column =
    element_at(transform(array(g), a =>
      shiftleft(size(a).cast("long"), 32)
        .bitwiseOR(size(array_distinct(a)).cast("long"))), 1)

  private def gramArray(n: Int): Column =
    if (n == 1) split(col("text"), " ")
    else graft.queries.DedupOps.shinglesN(col("text"), n, fallbackToText = false)

  private def compare(texts: Seq[String], n: Int): Unit = {
    TextFunctions.register(spark)
    val rows = texts.toDF("text")
      .select(expr(s"gram_stats(text, $n)").as("kernel"),
        oldPacked(gramArray(n)).as("old"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.get(0) == r.get(1),
        s"n=$n text=${t.take(60).mkString}: kernel=${r.get(0)} old=${r.get(1)}")
    }
  }

  private val fixtures = Seq(
    "", "a", "a b", "a b a b", "a  b", " a", "a ", "  ",
    "the quick brown fox the quick brown fox",
    "x x x x x x x x",
    "one two three four five six seven",
    "café lärm straße café lärm",
    "a b c a b c a b")

  test("kernel equals the HOF form on whitespace-edge fixtures, n=1..3") {
    (1 to 3).foreach(n => compare(fixtures, n))
  }

  test("kernel equals the HOF form on random strings (seeded property)") {
    val wordGen = Gen.frequency(
      (6, Gen.oneOf("a", "b", "ab", "the", "of", "xyz")),
      (2, Gen.alphaNumStr.map(_.take(5))),
      (1, Gen.const(""))) // empty words = consecutive spaces
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    val texts = (1 to 80).map(i =>
      textGen.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
    (1 to 3).foreach(n => compare(texts, n))
  }

  test("null propagation and the packed layout") {
    TextFunctions.register(spark)
    val rows = Seq(Option("a b a"), Option(""), Option.empty[String]).toDF("text")
      .select(expr("gram_stats(text, 1)")).collect()
    assert(rows(0).getLong(0) == (3L << 32 | 2L)) // 3 words, 2 distinct
    assert(rows(1).getLong(0) == (1L << 32 | 1L)) // "" splits to [""]
    assert(rows(2).isNullAt(0))
    // fewer than n words: zero grams, packed 0
    val two = Seq("one").toDF("text")
      .select(expr("gram_stats(text, 2)")).collect()
    assert(two(0).getLong(0) == 0L)
  }

  test("distinct_grams equals array_distinct(shinglesN(_, n, fallback=true)) incl. fallback") {
    TextFunctions.register(spark)
    val texts = fixtures ++ Seq("one two", "single") ++ {
      val wordGen = Gen.frequency(
        (6, Gen.oneOf("a", "b", "ab", "the", "of")),
        (2, Gen.alphaNumStr.map(_.take(4))),
        (1, Gen.const("")))
      val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
      (1 to 60).map(i =>
        textGen.pureApply(Gen.Parameters.default.withSize(25), Seed(100L + i)))
    }
    Seq(3, 5).foreach { n =>
      val rows = texts.toDF("text")
        .select(expr(s"distinct_grams(text, $n)").as("kernel"),
          array_distinct(graft.queries.DedupOps.shinglesN(col("text"), n)).as("old"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='${t.take(60)}'")
      }
    }
    // null text: kernel returns NULL (callers guarantee non-null input)
    val nul = Seq(Option.empty[String]).toDF("text")
      .select(expr("distinct_grams(text, 3)")).collect()
    assert(nul(0).isNullAt(0))
  }

  test("q_repetition output is unchanged vs a hand recompute at sf0.001") {
    val out = SparkEntry.queries("q_repetition")(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    // independent driver-side recompute on 5 sampled docs
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .filter(_.get(1) != null).take(5)
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(r => docs.contains(r.getLong(0))).foreach { r =>
      val ws = docs(r.getLong(0)).split(" ", -1)
      assert(r.getLong(1) == ws.length.toLong, "n_words")
      val dupW =
        if (ws.isEmpty) 0.0
        else BigDecimal((ws.length - ws.distinct.length).toDouble / ws.length)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - dupW) < 1e-12, "dup_word_frac")
    }
  }
}
