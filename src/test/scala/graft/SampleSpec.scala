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

  test("q_quality_gate: every kept doc meets its language median, medians are real scores") {
    val out = SparkEntry.queries("q_quality_gate")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("quality") >= r.getAs[Double]("lang_median"),
        s"doc ${r.getAs[Long]("doc_id")} below its gate")
    }
    // the lower median keeps at least half of each language's docs,
    // and never more than all of them
    val counts = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.length >= counts(lang) / 2, s"$lang kept under half")
      assert(rs.length <= counts(lang), s"$lang kept over total")
      // one threshold per language
      assert(rs.map(_.getAs[Double]("lang_median")).distinct.length == 1)
    }
  }

  test("q_split: content-keyed, duplicates co-assigned, 80/10/10 shape") {
    val out = SparkEntry.queries("q_split")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(out.length == docs, "split must assign every document")
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 1000)
      val expect = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(r.getAs[String]("split") == expect)
    }
    // rough shape: train is the large bucket
    val dist = out.groupBy(_.getAs[String]("split")).map { case (k, v) => k -> v.length }
    assert(dist("train") > dist.getOrElse("val", 0) + dist.getOrElse("test", 0))
  }

  test("q_split: duplicate and reordered content always lands in the same split") {
    import spark.implicits._
    // the sf fixture has no duplicated documents, so the leakage
    // property needs its own corpus: exact copies, a word-reordered
    // copy (same normalized fingerprint), fresh text, and null docs
    val docs = Seq[(Long, String)](
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),   // exact copy of 0
      (2L, "delta gamma beta alpha"),   // reordered copy of 0
      (3L, "a completely different document"),
      (4L, null),
      (5L, null))                       // nulls draw independently
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val tmp = java.nio.file.Files.createTempDirectory("splitdup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_split")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Long]("bucket")))).toMap
    assert(out.size == 6)
    // all three content-equal docs share bucket AND split
    assert(out(0L) == out(1L), s"exact copies split apart: ${out(0L)} vs ${out(1L)}")
    assert(out(0L) == out(2L), s"reordered copy split apart: ${out(0L)} vs ${out(2L)}")
    // null docs draw on namespaced ids — distinct keys, so (with this
    // fixture) distinct buckets rather than one collapsed bucket
    assert(out(4L)._2 != out(5L)._2, "null docs should not share one draw")
  }

  test("q_mix_budget: rates follow the equal-share formula and admissions respect them") {
    val out = SparkEntry.queries("q_mix_budget")(spark, sf).collect()
    assert(out.nonEmpty)
    val totalTokens = out.map(_.getAs[Long]("src_tokens")).sum
    val nSources = out.length.toLong
    out.foreach { r =>
      val expect = math.min(1000L,
        math.floor(totalTokens * 500.0 /
          (nSources * r.getAs[Long]("src_tokens"))).toLong)
      assert(r.getAs[Long]("rate_mille") == expect, s"${r.getAs[String]("source")} rate")
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("src_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("src_tokens"))
      // a full rate (1000) keeps everything
      if (r.getAs[Long]("rate_mille") == 1000L) {
        assert(r.getAs[Long]("kept_docs") == r.getAs[Long]("src_docs"))
        assert(r.getAs[Long]("kept_tokens") == r.getAs[Long]("src_tokens"))
      }
    }
    // deterministic rerun
    val rerun = SparkEntry.queries("q_mix_budget")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == rerun.map(_.toString).toSeq)
  }

  test("q_mix_temp: sqrt weights, flattened rates, admissions respect them") {
    val out = SparkEntry.queries("q_mix_temp")(spark, sf).collect()
    assert(out.nonEmpty)
    val totalTokens = out.map(_.getAs[Long]("src_tokens")).sum
    val wSum = out.map(_.getAs[Long]("weight_fp")).sum
    out.foreach { r =>
      val srcToks = r.getAs[Long]("src_tokens")
      assert(r.getAs[Long]("weight_fp") ==
        math.floor(math.sqrt(srcToks.toDouble) * 1e6).toLong)
      val expect = math.min(1000L,
        math.floor(totalTokens.toDouble * 500.0 * r.getAs[Long]("weight_fp") /
          (wSum.toDouble * srcToks)).toLong)
      assert(r.getAs[Long]("rate_mille") == expect, s"${r.getAs[String]("source")} rate")
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("src_docs"))
      assert(r.getAs[Long]("kept_tokens") <= srcToks)
    }
    // the temperature property: relative to proportional (equal-share)
    // mixing, a larger source never gets a LARGER rate than a smaller
    // one — and uncapped rates scale as 1/sqrt(tokens), i.e.
    // rate * sqrt(tokens) is ~constant across uncapped sources
    val uncapped = out.filter(_.getAs[Long]("rate_mille") < 1000L)
    if (uncapped.length >= 2) {
      val prods = uncapped.map(r =>
        r.getAs[Long]("rate_mille") * math.sqrt(r.getAs[Long]("src_tokens").toDouble))
      assert(prods.max / prods.min < 1.2,
        s"rate*sqrt(tokens) should be near-constant, got ${prods.min}..${prods.max}")
    }
  }

  test("q_shuffle_shards: shards partition the corpus with dense per-shard sequences") {
    val out = SparkEntry.queries("q_shuffle_shards")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(out.length == docs, "every document gets a shard slot")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    out.foreach { r =>
      val shard = r.getAs[Long]("shard")
      assert(shard >= 0 && shard < 8)
      assert(r.getAs[Long]("shard") == math.floorMod(r.getAs[Long]("rkey"), 8L))
    }
    out.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      // seq is dense 1..n within the shard, ordered by (rkey, doc_id)
      val ordered = rs.sortBy(r => (r.getAs[Long]("rkey"), r.getAs[Long]("doc_id")))
      assert(ordered.map(_.getAs[Long]("seq")).toSeq == (1L to rs.length),
        s"shard $shard sequence not dense")
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

  test("q_dsir matches an independent driver-side recompute; gate prefers target-like docs") {
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stop = Set("the", "a", "of", "and")
    def quality(t: String): Double = {
      val w = t.split(" ", -1)
      val nStop = w.count(stop)
      val nPunct = t.length - t.replaceAll("[.,;:!?'\"()\\[\\]{}-]", "").length
      val punct = if (t.isEmpty) 0.0 else nPunct.toDouble / t.length
      BigDecimal(0.4 * (nStop.toDouble / w.length) +
        0.3 * math.min(w.length / 100.0, 1.0) + 0.3 * (1.0 - punct))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        if (r.isNullAt(1)) null else r.getString(1)))
    // bucket stream + per-bucket (raw, target) counts
    val toks = docs.filter(_._2 != null).flatMap { case (id, t) =>
      val tgt = quality(t) >= 0.45
      t.split(" ", -1).filter(_.nonEmpty).map { w =>
        (id, tgt, java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16) % 1024L)
      }
    }
    val r = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val t = toks.filter(_._2).groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val (bigR, bigT) = (toks.length.toLong, toks.count(_._2).toLong)
    val perDoc = toks.groupBy(_._1).view.mapValues { ts =>
      val s = ts.map { case (_, _, b) =>
        math.round(math.log(
          ((t.getOrElse(b, 0L) + 1) * (bigR + 1024)).toDouble /
          ((r(b) + 1) * (bigT + 1024)).toDouble) * 1e9)
      }.sum
      (ts.length.toLong, s)
    }.toMap
    val totL = perDoc.values.map(_._2).sum
    val totN = perDoc.values.map(_._1).sum
    val out = SparkEntry.queries("q_dsir")(spark, sf).collect()
    assert(out.length == docs.length)
    out.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      perDoc.get(id) match {
        case Some((n, s)) =>
          assert(row.getAs[Long]("n_toks") == n, s"doc $id n_toks")
          assert(row.getAs[Long]("llr_fp") == s, s"doc $id llr_fp")
          assert(row.getAs[Boolean]("selected") == (s * totN > totL * n), s"doc $id gate")
        case None =>
          assert(row.getAs[Long]("n_toks") == 0L)
          assert(!row.getAs[Boolean]("selected"))
      }
    }
    // the gate splits the corpus and points the right way: selected
    // docs are stopword-heavier (more target-like) on average
    val sel = out.filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("doc_id")).toSet
    assert(sel.nonEmpty && sel.size < out.length, s"degenerate gate: ${sel.size}")
    def stopFrac(ids: Set[Long]): Double = {
      val ws = docs.filter(dd => dd._2 != null && ids(dd._1))
        .flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
      ws.count(stop).toDouble / ws.length
    }
    val rest = docs.map(_._1).toSet -- sel
    assert(stopFrac(sel) > stopFrac(rest),
      "selected slice must be more target-like (stopword-heavier)")
  }

  test("q_length_buckets matches an independent pow2-bucket recompute") {
    def pow2ceil(n: Long): Long = { var b = 1L; while (b < n) b <<= 1; b }
    val docs = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => Option(if (r.isNullAt(0)) null else r.getString(0)))
    val exp = docs.map(t => pow2ceil(math.max(1, t.split(" ", -1).length)))
      .zip(docs.map(_.split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues { xs =>
        (xs.length.toLong, xs.map(_._2).sum)
      }.toMap
    val out = SparkEntry.queries("q_length_buckets")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.length)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert((b & (b - 1)) == 0 && b >= 1, s"bucket $b not a power of two")
      val (nd, nt) = exp(b)
      assert(r.getAs[Long]("n_docs") == nd, s"bucket $b n_docs")
      assert(r.getAs[Long]("n_tokens") == nt, s"bucket $b n_tokens")
      val padded = b * nd
      assert(r.getAs[Long]("padded_tokens") == padded)
      assert(r.getAs[Long]("waste_fp") ==
        (2 * (padded - nt) * 1000000L + padded) / (2 * padded), s"bucket $b waste")
    }
  }

  test("q_corpus_diff classifies a planted 4-status corpus incl. a null-text doc") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cdiff").toString
    Seq(
      (1L, "stable text here", "en", "s0", 16L),     // unchanged
      (3L, "gets removed", "en", "s0", 12L),          // 3 % 17 == 3
      (5L, "gets edited", "en", "s0", 11L),           // 5 % 13 == 5
      (7L, "gets duplicated", "en", "s0", 15L),       // 7 % 19 == 7 → +added twin
      (22L, null.asInstanceOf[String], "en", "s0", 0L)) // null text: unchanged via <=>
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_corpus_diff")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(
      1L -> "unchanged", 3L -> "removed", 5L -> "changed",
      7L -> "unchanged", 1000007L -> "added", 22L -> "unchanged"))
  }

  test("q_shard_manifest matches an independent driver-side recompute (xor checksum incl.)") {
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        if (r.isNullAt(1)) null else r.getString(1)))
    assert(docs.nonEmpty)
    case class M(var nDocs: Long = 0, var nContent: Long = 0, var nToks: Long = 0,
                 var xor: Long = 0, var fpMin: Long = Long.MaxValue,
                 var fpMax: Long = Long.MinValue)
    val exp = scala.collection.mutable.Map[Long, M]()
    docs.foreach { case (id, text) =>
      val shard = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 8
      val m = exp.getOrElseUpdate(shard, M())
      m.nDocs += 1
      if (text != null) {
        val fp = java.lang.Long.parseLong(md5hex(text).substring(0, 15), 16)
        m.nContent += 1
        m.nToks += text.split(" ", -1).length
        m.xor ^= fp
        m.fpMin = math.min(m.fpMin, fp)
        m.fpMax = math.max(m.fpMax, fp)
      }
    }
    val out = SparkEntry.queries("q_shard_manifest")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.length)
    out.foreach { r =>
      val m = exp(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_docs") == m.nDocs)
      assert(r.getAs[Long]("n_content") == m.nContent)
      assert(r.getAs[Long]("n_tokens") == m.nToks)
      assert(r.getAs[Long]("checksum_xor") == m.xor, "order-free xor checksum")
      assert(r.getAs[Long]("fp_min") == m.fpMin)
      assert(r.getAs[Long]("fp_max") == m.fpMax)
    }
  }

  test("zInterleave: hand-computed Morton codes; q_zorder buckets tile the key plane") {
    import spark.implicits._
    // a=0b11, b=0b01 -> odd bits from a, even from b: 0b1011 = 11
    val z = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(graft.queries.SampleOps.zInterleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(11L, 0L, 2L, 1L, (1L << 32) - 1))
    val rows = SparkEntry.queries("q_zorder")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 64)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.lineitem(spark, sf).count())
    // the z-order property: each bucket's 2-D span covers a QUADRANT
    // of the key plane (~1/8 per dim at 64 buckets), not a stripe --
    // allow 2x slack for the uneven top-level split of scaled maxima
    val pmax = rows.map(_.getAs[Long]("p_max")).max
    val smax = rows.map(_.getAs[Long]("s_max")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("p_span") <= pmax / 4 + 2, s"p stripe: $r")
      assert(r.getAs[Long]("s_span") <= smax / 4 + 2, s"s stripe: $r")
    }
  }

  test("q_split_leakage: flag consistency; exact duplicates never leak") {
    val rows = graft.queries.SampleOps.q_split_leakage(TestSpark.spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    val splits = graft.queries.SampleOps.q_split(TestSpark.spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.foreach { r =>
      val sa = r.getAs[String]("split_a"); val sb = r.getAs[String]("split_b")
      // split labels agree with the split key itself
      assert(sa == splits(r.getAs[Long]("doc_a")))
      assert(sb == splits(r.getAs[Long]("doc_b")))
      assert(r.getAs[Boolean]("leaks") == (sa != sb))
      // exact duplicates share the normalized fingerprint, hence the
      // split: content-keyed assignment cannot leak them
      if (r.getAs[Double]("jaccard") == 1.0) {
        assert(!r.getAs[Boolean]("leaks"), s"exact dup leaked: $r")
      }
    }
  }

  test("q_split_group: zero leaks across BOTH near-dup families by construction") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_split_group")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every document gets a group split row")
    val split = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split")).toMap
    val group = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("group_id")).toMap
    // the audit q_split_leakage runs over the content split must come
    // back empty here: both pair families co-assign
    val mh = graft.queries.DedupOps.q_dedup_minhash(spark, sf)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val sh = graft.queries.DedupOps.q_dedup_simhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    (mh ++ sh).foreach { case (a, b) =>
      assert(group(a) == group(b), s"pair ($a,$b) split across groups")
      assert(split(a) == split(b), s"pair ($a,$b) leaks across splits")
    }
    // group ids are component minima: never above the member, and a
    // doc in no pair routes by its own id
    val paired = (mh ++ sh).flatMap(p => Seq(p._1, p._2)).toSet
    rows.foreach { r =>
      val (id, g) = (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))
      assert(g <= id)
      if (!paired.contains(id)) assert(g == id, s"singleton $id regrouped")
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < 1000)
      val expected =
        if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
      assert(r.getAs[String]("split") == expected)
    }
  }

  test("q_mix_lm replays exactly from the backoff per-doc table; weights share to ~1e6") {
    val perDoc = SparkEntry.queries("q_lm_backoff")(spark, sf).collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_trigrams"),
        r.getAs[Long]("sum_score_fp")))
    val src = graft.Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pooled = perDoc.groupBy(t => src(t._1)).view.mapValues { ds =>
      val n = ds.map(_._2).sum; val s = ds.map(_._3).sum
      val mean = if (s >= 0) s / n else -((-s) / n)
      (ds.length.toLong, n, mean)
    }.toMap
    val best = pooled.values.map(_._3).max
    val tot = pooled.values.map(best - _._3 + 1000L).sum
    val rows = SparkEntry.queries("q_mix_lm")(spark, sf).collect()
    assert(rows.length == pooled.size)
    var wsum = 0L
    rows.foreach { r =>
      val (nd, nt, mean) = pooled(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_trigrams") == nt)
      assert(r.getAs[Long]("mean_score_fp") == mean)
      val deficit = best - mean
      assert(r.getAs[Long]("deficit_fp") == deficit)
      val w = (2L * (deficit + 1000L) * 1000000L + tot) / (2L * tot)
      assert(r.getAs[Long]("weight_fp") == w)
      wsum += w
    }
    // round-half-up shares reconstruct the unit within one ulp per source
    assert(math.abs(wsum - 1000000L) <= rows.length.toLong)
    // the control signal is live: not all sources fit equally
    assert(rows.map(_.getAs[Long]("deficit_fp")).distinct.length > 1)
  }

  test("q_sample_stratified equals q_sample_reservoir row for row (operator vs aggregator)") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("draw"))).toSet
    val strat = rows("q_sample_stratified")
    assert(strat == rows("q_sample_reservoir"))
    assert(strat.nonEmpty)
    // contract shape: contiguous ranks, draws non-decreasing per lang
    strat.groupBy(_._1).values.foreach { g =>
      val sorted = g.toSeq.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length))
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("q_mix_epoch: integer allocation replays; both cap branches exercised; budget conserved") {
    val rows = SparkEntry.queries("q_mix_epoch")(spark, sf).collect()
    assert(rows.length == 5) // the corpus's five languages
    val total = rows.map(_.getAs[Long]("lang_tokens")).sum
    val wSum = rows.map(_.getAs[Long]("weight_fp")).sum
    rows.foreach { r =>
      val (lt, w) = (r.getAs[Long]("lang_tokens"), r.getAs[Long]("weight_fp"))
      assert(w == math.floor(math.sqrt(lt.toDouble) * 1e6).toLong)
      val alloc = 4L * total * w / wSum
      assert(r.getAs[Long]("alloc_tokens") == alloc)
      val epochs = (2 * alloc * 1000000L + lt) / (2 * lt)
      assert(r.getAs[Long]("epochs_fp") == epochs)
      assert(r.getAs[Boolean]("over_cap") == (epochs > 4000000L))
      assert(r.getAs[Long]("effective_tokens") == math.min(alloc, 4 * lt))
    }
    // measured non-degenerate: en (high-resource) stays under the
    // 4-epoch cap, at least one low-resource language exceeds it
    assert(rows.exists(r => r.getAs[Boolean]("over_cap")))
    assert(rows.exists(r => !r.getAs[Boolean]("over_cap")))
    // allocations exhaust the budget up to one truncated token per lang
    val budget = 4L * total
    val allocSum = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(allocSum <= budget && budget - allocSum < rows.length,
      s"alloc $allocSum vs budget $budget")
    // effective <= alloc, strictly less exactly on the capped langs
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("effective_tokens"))
      assert(e <= a)
      assert((e < a) == r.getAs[Boolean]("over_cap"))
    }
  }

  test("q_dp_hist: the Laplace inverse-CDF replays bit-for-bit from md5 driver-side") {
    val rows = SparkEntry.queries("q_dp_hist")(spark, sf).collect()
    assert(rows.length == 5)
    val trueN = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(lang.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(md.take(8), 16)
      val mag = math.max(1.0 - 2.0 * math.abs(draw.toDouble / 4294967296.0 - 0.5),
        1.0 / 4294967296.0)
      // Spark round(double) = BigDecimal.valueOf + HALF_UP (not rint)
      val noise = (if (draw >= 2147483648L) 1L else -1L) *
        java.math.BigDecimal.valueOf(-math.log(mag) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
      assert(r.getAs[Long]("n") == trueN(lang))
      assert(r.getAs[Long]("noise_fp") == noise, s"$lang noise")
      assert(r.getAs[Long]("noisy_n_fp") == trueN(lang) * 1000000L + noise)
    }
  }

  test("q_shard_quality replays from q_shuffle_shards + lang joins; hash shards mix well") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_shard_quality")(spark, sf).collect()
      .map(r => r.getAs[Long]("shard") -> r).toMap
    assert(rows.keySet == (0L until 8L).toSet)
    // independent replay: shard assignment from the declared
    // q_shuffle_shards output, langs from the documents table
    val shardOf = SparkEntry.queries("q_shuffle_shards")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val langs = Tables.documents(spark, sf)
      .filter(col("lang").isNotNull)
      .select("doc_id", "lang").collect()
      .map(r => (shardOf(r.getAs[Long]("doc_id")), r.getAs[String]("lang")))
    val byCell = langs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byLang = langs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val total = langs.length.toLong
    (0L until 8L).foreach { sh =>
      val cells = byCell.filter(_._1._1 == sh)
      val nS = cells.values.sum
      assert(rows(sh).getAs[Long]("n_docs") == nS)
      assert(rows(sh).getAs[Long]("n_langs") == cells.size.toLong)
      val dev = cells.map { case ((_, lang), nSl) =>
        val num = 2L * 1000L * math.abs(nSl * total - byLang(lang) * nS) + nS * total
        num / (2L * nS * total)
      }.max
      assert(rows(sh).getAs[Long]("max_dev_mille") == dev)
    }
    // the md5 draw is content-independent, so deviations are pure
    // binomial noise: at sf0.001's ~62 docs/shard the per-lang share
    // std is ~45 per-mille — allow ~4 sigma, which a content-correlated
    // draw (the defect this audit exists to catch) would blow through
    assert(rows.values.map(_.getAs[Long]("max_dev_mille")).max < 250L)
  }

  test("q_kanon: class sizes, flags, and risk replay from raw customer rows") {
    val out = SparkEntry.queries("q_kanon")(spark, sf).collect()
    assert(out.nonEmpty)
    val classes = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(out.length == classes.size)
    // sizes partition the table: every customer is in exactly one class
    assert(out.map(_.getAs[Long]("n")).sum == classes.values.sum)
    out.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"))
      val n = classes(key)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Boolean]("violates_k") == (n < 10))
      // round-half-up(1e6 / n) on positive operands
      assert(r.getAs[Long]("risk_fp") == (2L * 1000000L + n) / (2L * n))
    }
  }

  test("q_ldiversity: distinct sensitive bands replay exactly, incl. negative balances") {
    val out = SparkEntry.queries("q_ldiversity")(spark, sf).collect()
    assert(out.nonEmpty)
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map { r =>
        val cents = java.math.BigDecimal.valueOf(r.getAs[Double]("c_acctbal"))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        ((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")),
          Math.floorDiv(cents, 100000L)) // floor, not truncate: negatives band down
      }
    // the fixture must exercise the negative-balance floor path, or this
    // test silently stops guarding the div-vs-// divergence
    assert(rows.exists(_._2 < 0L), "fixture needs a negative acctbal band")
    val byClass = rows.groupBy(_._1)
    out.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"))
      val bands = byClass(key).map(_._2)
      assert(r.getAs[Long]("n") == bands.length.toLong)
      assert(r.getAs[Long]("distinct_sensitive") == bands.distinct.length.toLong)
      assert(r.getAs[Boolean]("violates_l") == (bands.distinct.length < 6))
    }
  }

  test("q_tcloseness: ordered-domain EMD replays from raw rows in exact integers") {
    val out = SparkEntry.queries("q_tcloseness")(spark, sf).collect()
    assert(out.nonEmpty)
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map { r =>
        val cents = java.math.BigDecimal.valueOf(r.getAs[Double]("c_acctbal"))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        ((r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment")),
          Math.floorDiv(cents, 100000L))
      }
    val bigN = rows.length.toLong
    val allBands = rows.map(_._2).distinct.sorted
    val globalByBand = rows.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val byClass = rows.groupBy(_._1)
    val denomBands = math.max(allBands.length - 1, 1).toLong
    out.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"))
      val classBands = byClass(key).groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
      val n = byClass(key).length.toLong
      var cn = 0L; var cg = 0L; var diff = 0L
      allBands.foreach { b =>
        cn += classBands.getOrElse(b, 0L); cg += globalByBand(b)
        diff += math.abs(cn * bigN - cg * n)
      }
      val d = n * bigN * denomBands
      val tFp = (2L * 1000000L * diff + d) / (2L * d)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("t_fp") == tFp, s"$key")
      assert(r.getAs[Boolean]("violates_t") == (tFp > 200000L))
    }
    // the EMD must actually vary across classes, or the key verifies a constant
    assert(out.map(_.getAs[Long]("t_fp")).distinct.length > 5)
  }

  test("q_dp_quantile: Gumbel-max exponential mechanism replays bit-for-bit driver-side") {
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val out = SparkEntry.queries("q_dp_quantile")(spark, sf).collect()
    assert(out.nonEmpty)
    val bands = Tables.customer(spark, sf).select("c_acctbal").collect()
      .map { r =>
        val cents = java.math.BigDecimal.valueOf(r.getAs[Double]("c_acctbal"))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        Math.floorDiv(cents, 100000L)
      }
    val n = bands.length.toLong
    val counts = bands.groupBy(identity).map { case (b, v) => b -> v.length.toLong }
    var cum = 0L
    val expect = counts.keys.toSeq.sorted.map { b =>
      cum += counts(b)
      val u2 = -math.abs(2L * cum - n)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(b.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(md.take(8), 16)
      val yFp = math.max(1L, halfUp(-math.log(
        math.max(draw.toDouble / 4294967296.0, 1.0 / 4294967296.0)) * 1e9))
      val gumbelFp = -halfUp(math.log(yFp.toDouble / 1e9) * 1e6)
      b -> (counts(b), u2, gumbelFp, u2 * 250000L + gumbelFp)
    }.toMap
    val bestBand = expect.toSeq.minBy { case (b, (_, _, _, s)) => (-s, b) }._1
    assert(out.length == expect.size)
    out.foreach { r =>
      val b = r.getAs[Long]("bal_band")
      val (nB, u2, g, s) = expect(b)
      assert(r.getAs[Long]("n_b") == nB)
      assert(r.getAs[Long]("u2") == u2, s"band $b utility")
      assert(r.getAs[Long]("gumbel_fp") == g, s"band $b gumbel")
      assert(r.getAs[Long]("score_fp") == s)
      assert(r.getAs[Boolean]("released") == (b == bestBand))
    }
    // exactly one band is released, and the mechanism keeps utility high:
    // at epsilon=1 the released band's rank distance stays within the
    // Gumbel noise scale of the true median band
    assert(out.count(_.getAs[Boolean]("released")) == 1)
  }

  test("q_curriculum: stages partition the corpus in quality order with balanced sizes") {
    val rows = SparkEntry.queries("q_curriculum")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("stage")).toSeq == Seq(1L, 2L, 3L, 4L))
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    // position-formula stages: sizes differ by at most 1
    assert(nDocs.max - nDocs.min <= 1L, s"unbalanced stages: ${nDocs.toSeq}")
    assert(nDocs.sum == Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count())
    // quality strictly non-increasing across stage boundaries: stage
    // k's minimum >= stage k+1's maximum (descending rank order)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("qf_min") >= b.getAs[Long]("qf_max"),
        s"stage order violated: $a vs $b")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("qf_min") <= r.getAs[Long]("mean_qf") &&
        r.getAs[Long]("mean_qf") <= r.getAs[Long]("qf_max"))
    }
  }

  test("q_dp_topk: Gumbel scores replay driver-side; leaders survive, borderline cells flip") {
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val out = SparkEntry.queries("q_dp_topk")(spark, sf).collect()
    assert(out.nonEmpty)
    def gumbel(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(md.take(8), 16)
      val yFp = math.max(1L, halfUp(-math.log(
        math.max(draw.toDouble / 4294967296.0, 1.0 / 4294967296.0)) * 1e9))
      -halfUp(math.log(yFp.toDouble / 1e9) * 1e6)
    }
    out.foreach { r =>
      val g = gumbel(s"${r.getAs[String]("lang")}:${r.getAs[String]("source")}")
      assert(r.getAs[Long]("gumbel_fp") == g, s"gumbel mismatch: $r")
      assert(r.getAs[Long]("score_fp") == r.getAs[Long]("n") * 2000000L + g)
    }
    // threshold semantics: every released score >= every unreleased score
    val (rel, unrel) = out.partition(_.getAs[Boolean]("released"))
    assert(rel.length == 5, s"released ${rel.length} cells")
    assert(rel.map(_.getAs[Long]("score_fp")).min >=
      unrel.map(_.getAs[Long]("score_fp")).max)
    // the clear leader survives the noise; a borderline cell flipped
    // (the released set differs from the deterministically tiebroken
    // raw top-5) - the regime the epsilon choice targets
    val byN = out.sortBy(r => (-r.getAs[Long]("n"),
      r.getAs[String]("lang"), r.getAs[String]("source")))
    assert(byN.head.getAs[Boolean]("released"), "raw leader suppressed")
    val rawTop = byN.take(5).map(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    val relSet = rel.map(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    assert(rawTop != relSet, "noise never flipped a borderline cell")
  }

  test("q_sample_es: exponential keys replay exactly and the sample skews heavy") {
    def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val out = SparkEntry.queries("q_sample_es")(spark, sf).collect()
    val pool = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("n_chars") > 0)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars"))
    val keys = pool.map { case (id, w) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(md.take(8), 16)
      val lnuFp = halfUp(-math.log(
        math.max(draw.toDouble / 4294967296.0, 1.0 / 4294967296.0)) * 1e9)
      (id, w, (2L * lnuFp * 1000000L + w) / (2L * w))
    }
    val expect = keys.sortBy(t => (t._3, t._1)).take(math.min(50, keys.length))
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (id, w, k)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("n_chars") == w)
      assert(r.getAs[Long]("key_fp") == k)
    }
    // weight-proportional selection must skew toward long documents:
    // the sampled mean length exceeds the pool mean (a uniform draw in
    // disguise - e.g. the weight dropping out of the key - fails this)
    val poolMean = pool.map(_._2).sum.toDouble / pool.length
    val sampleMean = out.map(_.getAs[Long]("n_chars")).sum.toDouble / out.length
    assert(sampleMean > poolMean,
      s"weighted sample mean $sampleMean should exceed pool mean $poolMean")
  }
}
