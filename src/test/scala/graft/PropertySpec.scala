package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4) over small generated
  * DataFrames: laws that must hold for any input, not just the fixture
  * data.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Deterministic property driver: scalatest+scalacheck without the
    * scalatestplus bridge (not in the offline dep set) — draw seeded
    * samples and assert the body for each.
    */
  private def forAll[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      body(
        ga.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong + 1000)))
    }

  private val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "e", "the", "of")
  private val docGen  = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))
  private val docsGen = Gen.nonEmptyListOf(docGen)

  test("TopKAggregator equals sort-based top-k under arbitrary partitioning and merge order") {
    val pairGen  = for { s <- Gen.chooseNum(0, 100); id <- Gen.chooseNum(0L, 50L) } yield (s / 10.0, id)
    val pairsGen = Gen.listOf(pairGen)
    forAll(pairsGen, Gen.chooseNum(1, 5)) { (pairs, k) =>
      val a = new graft.functions.TopKAggregator(k)
      // partition by index mod 3, reduce each slice, merge in slice order
      val bufs = pairs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
        .map { case (_, ps) => ps.map(_._1).foldLeft(a.zero)(a.reduce) }
      val merged = bufs.foldLeft(a.zero)(a.merge)
      val expect = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(a.finish(merged).toList == expect)
    }
  }

  test("BoundedCollectAggregator equals the exact model under arbitrary partitioning") {
    val idsGen = Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct)
    forAll(idsGen, Gen.chooseNum(1, 8)) { (ids, cap) =>
      val a = new graft.functions.BoundedCollectAggregator(cap)
      val bufs = ids.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
        .map { case (_, xs) => xs.map(_._1).foldLeft(a.zero)(a.reduce) }
      val merged = bufs.foldLeft(a.zero)(a.merge)
      val expect = if (ids.length > cap) Nil else ids.sorted
      assert(a.finish(merged).toList == expect,
        s"cap=$cap n=${ids.length}")
    }
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.groupBy("text").agg(min("doc_id").as("doc_id"))
      val twice = once.groupBy("text").agg(min("doc_id").as("doc_id"))
      assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
    }
  }

  test("explode row count equals the sum of array lengths") {
    forAll(docsGen) { texts =>
      val df = texts.toDF("text").withColumn("words", split(col("text"), " "))
      val exploded = df.select(explode(col("words"))).count()
      val expected = df.select(sum(size(col("words")))).head.getLong(0)
      assert(exploded == expected)
    }
  }

  test("unionAll count is additive; except removes exactly the intersection") {
    forAll(Gen.listOf(Gen.chooseNum(0, 20)), Gen.listOf(Gen.chooseNum(0, 20))) { (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      assert(a.unionByName(b).count() == xs.length + ys.length)
      val exceptCount = a.except(b).count()
      val expected = (xs.toSet -- ys.toSet).size
      assert(exceptCount == expected)
    }
  }

  test("running window sum ends at the group total") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(1L, 100L)))) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "v", "ord")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("ord")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val last = df.withColumn("run", sum("v").over(w))
        .groupBy("g").agg(max("run").as("final"))
      val direct = df.groupBy("g").agg(sum("v").as("total"))
      assert(last.join(direct, "g").filter(col("final") =!= col("total")).isEmpty)
    }
  }

  test("jaccard is 1 for identical docs, 0 for disjoint vocab, symmetric bounds") {
    forAll(docGen) { text =>
      val df = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("prop").toString
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val pairs = graft.queries.DedupOps.q_ngram_jaccard(spark, tmp).collect()
      assert(pairs.length == 1 && pairs.head.getAs[Double]("jaccard") == 1.0)
    }
  }

  test("minhash signature equality follows from shingle-set equality") {
    forAll(docGen, Gen.chooseNum(0, 5)) { (text, rot) =>
      // a rotation of the same words has the same shingle multiset only
      // if rot == 0; identical docs must always produce identical sigs
      val df = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("prop-mh").toString
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val sigs = graft.queries.DedupOps.q_minhash(spark, tmp).collect()
      val s0 = sigs.find(_.getLong(0) == 0L).get
      val s1 = sigs.find(_.getLong(0) == 1L).get
      (1 to 8).foreach(i => assert(s0.getAs[Long](s"h$i") == s1.getAs[Long](s"h$i")))
    }
  }

  test("q_lm_bigram equals a driver-side reference model on random corpora") {
    val docGen2 = Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen2)
    forAll(corpusGen, 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tmp = java.nio.file.Files.createTempDirectory("plm").toString
      docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      // reference: same tokenization (split keeps inner empties; the
      // generator emits no leading/trailing spaces)
      def words(t: String) = t.split(" ", -1).toSeq
      val bigrams = docs.flatMap { case (id, t) =>
        val w = words(t)
        if (w.length >= 2) w.sliding(2).map(p => (id, p.head, p(1))).toSeq else Nil
      }
      val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
      val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
      val v = docs.flatMap(d => words(d._2)).distinct.size
      val expected = docs.map { case (id, t) =>
        val bs = bigrams.filter(_._1 == id)
        id -> (if (bs.isEmpty) None else Some {
          val s = bs.map { case (_, w1, w2) =>
            math.round(math.log((c12((w1, w2)) + 1).toDouble / (c1(w1) + v)) * 1e9)
          }.sum
          (bs.size.toLong,
            BigDecimal(java.math.BigDecimal.valueOf(s.toDouble / bs.size / 1e9))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        })
      }.toMap
      val got = graft.queries.TextOps.q_lm_bigram(spark, tmp).collect()
      assert(got.length == docs.length)
      got.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        expected(id) match {
          case None =>
            assert(r.isNullAt(r.fieldIndex("n_bigrams")), s"doc $id")
          case Some((nb, mean)) =>
            assert(r.getAs[Long]("n_bigrams") == nb, s"doc $id")
            assert(r.getAs[Double]("mean_logp") == mean, s"doc $id")
        }
      }
    }
  }

  test("q_lm_backoff equals a driver-side stupid-backoff replay on random corpora") {
    val docGen2 = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen2)
    forAll(corpusGen, 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tmp = java.nio.file.Files.createTempDirectory("plmbo").toString
      docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      def words(t: String) = t.split(" ", -1).toSeq
      val train = docs.filter(_._1 % 2 == 0)
      val c1 = train.flatMap(d => words(d._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val nTrain = train.map(d => words(d._2).size.toLong).sum
      def grams(n: Int) = train.flatMap { d =>
        val w = words(d._2)
        if (w.length >= n) w.sliding(n).map(_.mkString(" ")).toSeq else Nil
      }
      val c2 = grams(2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c3 = grams(3).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = docs.filter(_._1 % 2 == 1).map { case (id, t) =>
        val w = words(t)
        val tris = if (w.length >= 3) w.sliding(3).toSeq else Nil
        id -> (if (tris.isEmpty) None else Some {
          var (nTri, nBi, nUni, sum) = (0L, 0L, 0L, 0L)
          tris.foreach { g =>
            val tg = g.mkString(" ")
            val (b12, b23) = (s"${g(0)} ${g(1)}", s"${g(1)} ${g(2)}")
            if (c3.contains(tg)) {
              nTri += 1; sum += c3(tg) * 1000000000L / c2(b12)
            } else if (c2.contains(b23)) {
              nBi += 1; sum += 2L * c2(b23) * 1000000000L / (5L * c1(g(1)))
            } else {
              nUni += 1
              sum += 4L * c1.getOrElse(g(2), 0L) * 1000000000L / (25L * nTrain)
            }
          }
          (tris.size.toLong, nTri, nBi, nUni, sum, sum / tris.size)
        })
      }.toMap
      val got = graft.queries.TextOps.q_lm_backoff(spark, tmp).collect()
      assert(got.length == expected.size)
      got.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        expected(id) match {
          case None =>
            assert(r.isNullAt(r.fieldIndex("n_trigrams")), s"doc $id")
          case Some((n, t3, b2, u1, s, m)) =>
            assert(r.getAs[Long]("n_trigrams") == n, s"doc $id n")
            assert(r.getAs[Long]("n_tri") == t3, s"doc $id tri")
            assert(r.getAs[Long]("n_bi") == b2, s"doc $id bi")
            assert(r.getAs[Long]("n_uni") == u1, s"doc $id uni")
            assert(r.getAs[Long]("sum_score_fp") == s, s"doc $id sum")
            assert(r.getAs[Long]("mean_score_fp") == m, s"doc $id mean")
        }
      }
      // q_minkprob: same model, EVERY doc scored, bottom ceil(20%) mean
      val expMink = docs.map { case (id, t) =>
        val w = words(t)
        val tris = if (w.length >= 3) w.sliding(3).toSeq else Nil
        id -> (if (tris.isEmpty) None else Some {
          val scores = tris.map { g =>
            val tg = g.mkString(" ")
            val (b12, b23) = (s"${g(0)} ${g(1)}", s"${g(1)} ${g(2)}")
            if (c3.contains(tg)) c3(tg) * 1000000000L / c2(b12)
            else if (c2.contains(b23)) 2L * c2(b23) * 1000000000L / (5L * c1(g(1)))
            else 4L * c1.getOrElse(g(2), 0L) * 1000000000L / (25L * nTrain)
          }.sorted
          val k = (tris.size.toLong * 20L + 99L) / 100L
          val s = scores.take(k.toInt).sum
          (tris.size.toLong, k, s, s / k)
        })
      }.toMap
      val gotMink = graft.queries.TextOps.q_minkprob(spark, tmp).collect()
      assert(gotMink.length == docs.length)
      gotMink.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(r.getAs[Boolean]("in_train") == (id % 2 == 0))
        expMink(id) match {
          case None =>
            assert(r.isNullAt(r.fieldIndex("n_trigrams")), s"mink doc $id")
          case Some((n, k, s, m)) =>
            assert(r.getAs[Long]("n_trigrams") == n, s"mink doc $id n")
            assert(r.getAs[Long]("k") == k, s"mink doc $id k")
            assert(r.getAs[Long]("min_k_sum_fp") == s, s"mink doc $id sum")
            assert(r.getAs[Long]("min_k_mean_fp") == m, s"mink doc $id mean")
        }
      }
    }
  }

  test("TopKPerGroup operator equals the window rank-filter on arbitrary data with nulls") {
    // rows: (id, group, value) — group and value may be NULL; the id
    // tie-break keeps the order total (the operator's contract)
    val rowGen = for {
      g <- Gen.option(Gen.chooseNum(0L, 4L))
      v <- Gen.option(Gen.chooseNum(0L, 9L))
    } yield (g, v)
    val rowsGen = Gen.nonEmptyListOf(rowGen)
    forAll(rowsGen, Gen.chooseNum(1, 4)) { (rows, k) =>
      val df = rows.zipWithIndex.map { case ((g, v), i) =>
        (i.toLong, g.map(java.lang.Long.valueOf).orNull,
          v.map(java.lang.Long.valueOf).orNull)
      }.toDF("id", "g", "v").repartition(5) // force multi-partition partials
      val heap = graft.plans.TopKPerGroup.topKPerGroup(df,
          Seq(col("g")), Seq(col("v").desc, col("id")), k)
        .collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
          r.getAs[Long]("rank"))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val win = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
          r.getAs[Long]("rank"))).toSet
      assert(heap == win, s"k=$k rows=${rows.length}")
    }
  }
}
