package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Multimodal

/** The real media codecs against driver-side closed forms — the WAV
  * path (round 9) mirrors what q_media_decode's oracle proves for the
  * PNG path: an actual encode→decode round trip through the bundled
  * JVM codec, checked arithmetically by an independent computation.
  */
class MediaCodecSpec extends AnyFunSuite {
  import TestSpark._

  private def closedForm(id: Long, n: Int): (Long, Long, Long, Long) = {
    val vs = (0 until n).map(i => ((id * 31 + i * 7) % 65536) - 32768)
    (vs.sum, vs.map(math.abs).sum, vs.min, vs.max)
  }

  test("WAV encode->decode round trip recovers the closed-form samples") {
    for (id <- Seq(0L, 1L, 7L, 63L, 1000L)) {
      val (sr, n, sum, sumAbs, mn, mx) =
        Multimodal.decodeWav(Multimodal.encodeWav(id, 256, 16000))
          .getOrElse(fail(s"decode failed for id=$id"))
      val (wSum, wAbs, wMn, wMx) = closedForm(id, 256)
      assert(sr == 16000 && n == 256)
      assert((sum, sumAbs, mn, mx) == ((wSum, wAbs, wMn, wMx)), s"id=$id")
    }
  }

  test("decodeWav rejects non-WAV payloads instead of throwing") {
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    // a truncated WAV header must not crash the decode boundary either
    val wav = Multimodal.encodeWav(1L, 16, 8000)
    assert(Multimodal.decodeWav(wav.take(10)).isEmpty)
  }

  test("decodeAudioFeatures fills the 8-float feature contract") {
    val f = Multimodal.decodeAudioFeatures(Multimodal.encodeWav(3L, 64, 8000))
      .getOrElse(fail("decode failed"))
    val (sum, sumAbs, mn, mx) = closedForm(3L, 64)
    assert(f.length == 8)
    assert(f(0) == 8000f && f(1) == 64f)
    assert(f(2) == sum / 64f && f(3) == sumAbs / 64f)
    assert(f(4) == mn.toFloat && f(5) == mx.toFloat)
  }

  test("q_media_audio matches the closed form on sf0.001") {
    val rows = SparkEntry.queries("q_media_audio")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (sum, sumAbs, mn, mx) = closedForm(id, 256)
      assert(r.getAs[Long]("sample_rate") == 16000L)
      assert(r.getAs[Long]("n_samples") == 256L)
      assert(r.getAs[Long]("sum_samples") == sum, s"id=$id")
      assert(r.getAs[Long]("sum_abs") == sumAbs, s"id=$id")
      assert(r.getAs[Long]("min_sample") == mn, s"id=$id")
      assert(r.getAs[Long]("max_sample") == mx, s"id=$id")
    }
  }

  test("q_media_frames (verified strings) stays in sync with frameSample (production binary)") {
    val scalar = Multimodal.q_media_frames(spark, sf).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_no")) ->
        ((r.getAs[Long]("n_bytes"), r.getAs[String]("frame_str")))).toMap
    val binary = Multimodal.frameSample(spark, sf).collect()
    assert(binary.length == scalar.size && binary.nonEmpty)
    binary.foreach { f =>
      val bytes = f.getAs[Array[Byte]]("frame_bytes")
      val got = scalar((f.getAs[Long]("media_id"), f.getAs[Int]("frame_no").toLong))
      assert(got == ((bytes.length.toLong, new String(bytes, "UTF-8"))),
        s"media ${f.getAs[Long]("media_id")} frame ${f.getAs[Int]("frame_no")}")
    }
  }

  test("fakeDecode stub is the positional byte-sum fold (the oracle's formula)") {
    val bytes = "The quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val feats = Multimodal.fakeDecode(bytes)
    assert(feats.length == 8)
    val expect = new Array[Long](8)
    bytes.zipWithIndex.foreach { case (b, i) => expect(i % 8) += (b & 0xff).toLong }
    assert(feats.map(_.toLong).toSeq == expect.toSeq)
    assert(Multimodal.fakeDecode(Array.emptyByteArray).toSeq == Seq.fill(8)(0f))
  }

  test("mediaFeatures routes audio rows through the real decoder when bytes are WAV") {
    // mediaTable's payloads are text bytes (not WAV), so the audio
    // rows fall back to fakeDecode — assert the ROUTING by feeding a
    // real WAV through the same decode path the mapPartitions uses
    val wav = Multimodal.encodeWav(5L, 32, 16000)
    assert(Multimodal.decodeAudioFeatures(wav).isDefined)
    assert(Multimodal.decodeAudioFeatures("plain text".getBytes).isEmpty)
  }

  test("banded-Hamming candidates equal brute force on a planted near-dup fixture (q_media_dedup recall)") {
    import TestSpark.spark.implicits._
    // planted around one base hash: near-dups at Hamming 1, 2, 3 (the
    // pigeonhole guarantee must surface ALL of them), a Hamming-4
    // neighbor (candidates may propose it, the exact confirm must drop
    // it), and far hashes — so every band width and the confirm filter
    // are exercised
    val base = 0x123456789abcdL
    val rows = Seq(
      1L -> base,
      2L -> (base ^ 1L),                                    // Hamming 1
      3L -> (base ^ (1L << 20) ^ (1L << 40)),               // Hamming 2
      4L -> (base ^ (1L << 5) ^ (1L << 25) ^ (1L << 45)),   // Hamming 3
      5L -> (base ^ 0xfL),                                  // Hamming 4: out
      6L -> (~base & Long.MaxValue),                        // far
      7L -> 0L)
    val got = graft.queries.DedupOps
      .bandedHammingPairs(rows.toDF("id", "h"), "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, s"banded=$got brute=$brute")
    assert(brute.exists(_._3 == 3L), "fixture must actually plant a depth-3 pair")
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L), "Hamming-4 neighbor must not pass the confirm")
  }
}
