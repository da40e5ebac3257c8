package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the deterministic sampling / corpus-prep operators
  * (graft.queries.SampleOps). Exact row-level correctness is covered by
  * the DuckDB oracle; these assert the semantic contracts.
  */
class SampleSpec extends AnyFunSuite {
  import TestSpark._

  test("q_sample_hash: per-stratum rates bound the draw, and reruns are identical") {
    val a = SparkEntry.queries("q_sample_hash")(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val cap = r.getAs[String]("lang") match {
        case "en" => 200L; case "zh" => 400L; case _ => 600L
      }
      assert(r.getAs[Long]("bucket") < cap)
    }
    val b = SparkEntry.queries("q_sample_hash")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // deterministic
  }

  test("q_sample_balance: smallest language keeps everything, rates follow the floor formula") {
    import TestSpark._
    val counts = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val target = counts.values.min
    val out = SparkEntry.queries("q_sample_balance")(spark, sf).collect()
    assert(out.nonEmpty)
    // every emitted rate is exactly floor(1000·target/n_lang), and
    // every kept row's draw is under its rate
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val expectRate = math.floor(target * 1000.0 / counts(lang)).toLong
      assert(r.getAs[Long]("keep_rate") == expectRate, s"$lang rate")
      assert(r.getAs[Long]("bucket") < expectRate)
    }
    // the smallest language's rate is 1000: ALL its docs survive
    val minLang = counts.minBy(_._2)._1
    val keptMin = out.count(_.getAs[String]("lang") == minLang)
    assert(keptMin == counts(minLang), s"smallest lang $minLang must keep all docs")
    // deterministic: a rerun selects the identical rows
    val rerun = SparkEntry.queries("q_sample_balance")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == rerun.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("q_chunk: contiguous stride coverage reconstructs every document exactly") {
    import TestSpark._
    val (window, stride) = (32, 24)
    val chunks = SparkEntry.queries("q_chunk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.sortBy(_.getAs[Long]("chunk_idx")) }
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, rs) =>
      val words = texts(id).split(" ", -1)
      // chunk indexes contiguous from 0; count matches the formula
      assert(rs.map(_.getAs[Long]("chunk_idx")).toSeq == (0L until rs.length).toSeq)
      val expectChunks =
        if (words.length <= window) 1
        else 1 + math.ceil((words.length - window).toDouble / stride).toInt
      assert(rs.length == expectChunks, s"doc $id chunk count")
      // reconstruction: first `stride` tokens of each non-final chunk
      // plus the whole final chunk = the original document
      val rebuilt = (rs.init.map(_.getAs[String]("chunk_text").split(" ", -1).take(stride))
        :+ rs.last.getAs[String]("chunk_text").split(" ", -1)).flatten
      assert(rebuilt.sameElements(words), s"doc $id reconstruction")
      // every chunk except the last is exactly `window` tokens
      rs.init.foreach(r => assert(r.getAs[Long]("n_chunk_tokens") == window))
      assert(rs.last.getAs[Long]("n_chunk_tokens") == words.length - (rs.length - 1) * stride)
    }
  }

  test("q_sample_reservoir: exactly min(k, group size) per language, contiguous ranks, sorted draws") {
    val langSizes = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q_sample_reservoir")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.length == math.min(20L, langSizes(lang)))
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to rs.length))
      val draws = sorted.map(_.getAs[Long]("draw"))
      assert(draws.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
    }
    // the kept set is the k smallest draws — spot-check against a full sort
    val full = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        graft.queries.SampleOps.hashDraw(col("doc_id"), 6).as("draw"))
      .collect().groupBy(_.getAs[String]("lang"))
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val expect = full(lang).sortBy(r => (r.getAs[Long]("draw"), r.getAs[Long]("doc_id")))
        .take(rs.length).map(_.getAs[Long]("doc_id")).toSet
      assert(rs.map(_.getAs[Long]("doc_id")).toSet == expect)
    }
  }

  test("q_pack_sequences: per-shard offsets are gapless running sums, seq ids namespaced") {
    val rows = SparkEntry.queries("q_pack_sequences")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("shard_offset") == expect,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_id") >> 40 == shard)
        assert((r.getAs[Long]("seq_id") & ((1L << 40) - 1)) == expect / 512)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("packSequences: offsets stay per-shard consistent at a different shard count") {
    val rows = queries.SampleOps.packSequences(spark, sf, 512, Some(3)).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("shard")).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("shard_offset") == expect,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_id") >> 40 == shard)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("q_pipeline_prep: quality gate, language allow-list, unique doc ids") {
    val rows = SparkEntry.queries("q_pipeline_prep")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.45)
      assert(Set("en", "fr", "de", "es").contains(r.getAs[String]("lang")))
      assert(r.getAs[Long]("n_dups") >= 1L)
    }
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
  }
}
