package graft

import graft.functions.MinHashAggregator
import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash8 UDAF equals the expression-pipeline signature") {
    val minhash8 = udaf(MinHashAggregator)
    val exploded = Tables.documents(spark, sf)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        explode(graft.queries.DedupOps.shingles3(col("text"))).as("x"))
    val viaUdaf = exploded.groupBy("doc_id")
      .agg(minhash8(col("x")).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toVector).toMap
    val viaExprs = graft.queries.DedupOps.q_minhash(spark, sf)
      .filter(col("doc_id") < 50)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (1 to 8).map(i => r.getAs[Long](s"h$i")).toVector).toMap
    assert(viaUdaf == viaExprs)
  }

  test("MisraGriesAggregator: hand-traced decrement-all eviction and rank-(k+1) merge truncation") {
    import scala.collection.mutable.ArrayBuffer
    val mg = new graft.functions.MisraGriesAggregator(2)
    // stream a,a,b,c with k=2: c arrives at a full summary ->
    // decrement-all -> a:1 survives, b evicted, c discarded
    var b = mg.zero
    Seq("a", "a", "b", "c").foreach(x => b = mg.reduce(b, x))
    assert(mg.finish(b) == Map("a" -> 1L))
    // merge {x:5,y:3} + {z:4,w:2} with k=2: pointwise sum has 4
    // entries; 3rd-largest count is 3 -> subtract 3, keep positive
    val left = ArrayBuffer(("x", 5L), ("y", 3L))
    val right = ArrayBuffer(("z", 4L), ("w", 2L))
    assert(mg.finish(mg.merge(left, right)) == Map("x" -> 2L, "z" -> 1L))
  }

  test("MisraGriesAggregator: guarantee band holds under adversarial partitioning") {
    // Zipf-ish fixture: value i appears ceil(600/i) times, 40 distinct
    // values vs k=8 counters - evictions and merge truncations both fire
    val rows = (1 to 40).flatMap(i => Seq.fill((600 + i - 1) / i)(f"v$i%02d"))
    val n = rows.length.toLong
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    for (parts <- Seq(1, 7, 13)) {
      val sk = rows.toDF("c").repartition(parts)
        .agg(graft.functions.MisraGriesAggregator.mg(8)(col("c")))
        .collect()(0).getMap[String, Long](0)
      assert(sk.size <= 8, s"summary exceeded k at parts=$parts")
      truth.foreach { case (key, t) =>
        sk.get(key).foreach { est =>
          assert(est <= t && est >= t - n / 9,
            s"band violated at parts=$parts for $key: est=$est true=$t")
        }
        if (t > n / 9)
          assert(sk.contains(key),
            s"heavy item $key (true=$t > ${n / 9}) evicted at parts=$parts")
      }
    }
  }

  test("q_heavyhitters: guarantee booleans true, threshold rows exact, evictions real") {
    val rows = SparkEntry.queries("q_heavyhitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_sketch") && r.getAs[Boolean]("within_band"), r.toString)
      assert(r.getAs[Long]("n_exact") * 17 > r.getAs[Long]("n_total"))
    }
    // eviction is exercised: the corpus alphabet exceeds the counter budget
    val distinctChars = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct().count()
    assert(distinctChars > 16, s"alphabet $distinctChars <= k: sketch never evicts")
  }

  test("BoundedCollectAggregator: sorted under cap, empty on overflow, merge stays capped") {
    // 90 ids spread over 8 partitions: each partial is under the cap of
    // 20, so saturation must happen in merge(), not reduce()
    val df = (1L to 100L).map(i => (if (i <= 90) "big" else "ok", i))
      .toDF("k", "id").repartition(8)
    val out = df.groupBy("k")
      .agg(graft.functions.BoundedCollectAggregator.bounded(20)(col("id")).as("ids"))
      .collect().map(r => r.getAs[String]("k") -> r.getSeq[Long](1)).toMap
    assert(out("big").isEmpty, "over-cap bucket must finish empty")
    assert(out("ok") == (91L to 100L), "surviving bucket must be sorted and exact")
  }

  test("BoundedCollectPairsAggregator: payload rides the id, id-sorted, overflow empties") {
    val df = (1L to 100L).map(i => (if (i <= 90) "big" else "ok", i, i * 10))
      .toDF("k", "id", "tag").repartition(8)
    val out = df.groupBy("k")
      .agg(graft.functions.BoundedCollectAggregator.boundedPairs(20)(col("id"), col("tag")).as("ids"))
      .collect().map(r => r.getAs[String]("k") -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(out("big").isEmpty, "over-cap bucket must finish empty")
    assert(out("ok").map(r => (r.getLong(0), r.getLong(1))) ==
      (91L to 100L).map(i => (i, i * 10)), "id-sorted with the paired payload intact")
  }

  test("candidatePairsTagged emits each unordered pair once with both payloads") {
    // two buckets sharing a pair: (1,2) appears in both, must dedup
    val rows = Seq(("b1", 1L, 11L), ("b1", 2L, 22L), ("b1", 3L, 33L),
      ("b2", 1L, 11L), ("b2", 2L, 22L)).toDF("band", "doc_id", "simhash")
    val pairs = graft.queries.DedupOps
      .candidatePairsTagged(rows, "band", "doc_id", "simhash", "a", "b")
      .select(col("a").getField("_1"), col("a").getField("_2"),
        col("b").getField("_1"), col("b").getField("_2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pairs == Set((1L, 11L, 2L, 22L), (1L, 11L, 3L, 33L), (2L, 22L, 3L, 33L)))
  }

  test("candidatePairsTagged dedup=false keeps per-band copies with the bucket attached") {
    val rows = Seq(("b1", 1L, 11L), ("b1", 2L, 22L), ("b1", 3L, 33L),
      ("b2", 1L, 11L), ("b2", 2L, 22L)).toDF("band", "doc_id", "simhash")
    val raw = graft.queries.DedupOps
      .candidatePairsTagged(rows, "band", "doc_id", "simhash", "a", "b",
        dedup = false, keepBucket = true)
      .select(col("band"), col("a").getField("_1"), col("b").getField("_1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the shared pair (1,2) must appear once per band; keepBucket says which
    assert(raw.toSet == Set(("b1", 1L, 2L), ("b1", 1L, 3L), ("b1", 2L, 3L), ("b2", 1L, 2L)))
    assert(raw.length == 4, "no distinct applied")
    // misuse guard: distinct over (bucket, pair) would not dedup pairs
    val e = intercept[IllegalArgumentException](graft.queries.DedupOps
      .candidatePairsTagged(rows, "band", "doc_id", "simhash", "a", "b", keepBucket = true))
    assert(e.getMessage.contains("keepBucket requires dedup = false"))
  }

  test("simhashPairs first-band emission equals a distinct over all band collisions") {
    // near-identical docs land in shared bands; the filter form must
    // produce exactly the distinct pair set, each pair exactly once
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, base), (1L, base), (2L, base),
      (3L, ((1 to 59).map(i => s"w$i") :+ "CHANGED").mkString(" ")),
      (4L, (1 to 60).map(i => s"zz$i").mkString(" "))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("fband").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.distinct.length == pairs.length, s"duplicate pair emitted: ${pairs.toSeq}")
    // the identical trio collides in BOTH bands — exactly the case the
    // first-band filter must emit once
    assert(pairs.toSet.intersect(Set((0L, 1L), (0L, 2L), (1L, 2L))).size == 3,
      s"identical docs must pair: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "disjoint-vocab doc paired")
  }

  test("mapGroupsWithState accumulates per-user stats across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    def ev(id: Long, u: Long, v: Double) =
      StatefulOps.Ev(id, Timestamp.valueOf("2024-01-01 10:00:00"), u, "purchase", v)
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("user_stats").outputMode("update").start()
    input.addData(ev(1, 7, 100.0), ev(2, 7, 50.0), ev(3, 8, 900.0))
    q.processAllAvailable()
    input.addData(ev(4, 7, 25.0), ev(5, 8, 200.0)) // state must carry over
    q.processAllAvailable()
    q.stop()
    // last update per user reflects the cumulative state
    val last = spark.table("user_stats").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n")) }
    assert(last(7L).getAs[Long]("n") == 3 && last(7L).getAs[Double]("total") == 175.0)
    assert(last(8L).getAs[Long]("n") == 2 && last(8L).getAs[Double]("total") == 1100.0)
    assert(last(8L).getAs[Boolean]("highSpender"))
    assert(!last(7L).getAs[Boolean]("highSpender"))
  }

  test("streamingFunnel equals the batch greedy kernel across an ordered two-batch replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    import spark.implicits._
    def ev(id: Long, t: String, u: Long, et: String) =
      StatefulOps.Ev(id, Timestamp.valueOf(t), u, et, 0.0)
    val batch1 = Seq(
      // user 1: chain COMPLETES across the batch boundary
      ev(1, "2024-01-01 09:00:00", 1, "signup"),
      ev(2, "2024-01-01 09:10:00", 1, "view"),
      // user 2: purchase arrives before any click -> must not chain yet
      ev(3, "2024-01-01 09:00:00", 2, "signup"),
      ev(4, "2024-01-01 09:05:00", 2, "view"),
      ev(5, "2024-01-01 09:06:00", 2, "purchase"),
      // user 3: no signup -> stuck at 0 forever
      ev(6, "2024-01-01 09:00:00", 3, "view"),
      // user 4: intra-batch DISORDER (added out of ts order) must be absorbed
      ev(7, "2024-01-01 09:30:00", 4, "view"),
      ev(8, "2024-01-01 09:20:00", 4, "signup"))
    val batch2 = Seq(
      ev(9, "2024-01-01 11:00:00", 1, "click"),
      ev(10, "2024-01-01 11:30:00", 1, "purchase"),
      ev(11, "2024-01-01 11:00:00", 2, "click"),
      ev(12, "2024-01-01 11:10:00", 2, "purchase"), // now ordered -> completes
      ev(13, "2024-01-01 11:00:00", 3, "click"),
      // user 5 appears only in batch 2, view past the 72h deadline
      ev(14, "2024-01-01 10:00:00", 5, "signup"),
      ev(15, "2024-01-05 10:00:01", 5, "view"))
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream").outputMode("update").start()
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // reached is monotone non-decreasing, so the final state per user
    // is the max update
    val streamed = spark.table("funnel_stream").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(_.getAs[Int]("reached")).max }
    assert(streamed == Map(1L -> 4, 2L -> 4, 3L -> 0, 4L -> 2, 5L -> 1))
    // user-for-user parity with the batch kernel over the union
    val all = (batch1 ++ batch2)
      .map(e => (e.user_id, e.event_type,
        e.ts.getTime * 1000L + (e.ts.getNanos % 1000000) / 1000L))
      .toDF("user_id", "event_type", "tu")
    val batch = graft.queries.TimeSeries.funnelReached(all).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("reached")).toMap
    assert(batch == streamed)
  }

  test("streamingFunnelUpdates emits ONLY on chain advances (change-log semantics)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    def ev(id: Long, t: String, u: Long, et: String) =
      StatefulOps.Ev(id, Timestamp.valueOf(t), u, et, 0.0)
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingFunnelUpdates(input.toDS())
      .writeStream.format("memory").queryName("funnel_cdc").outputMode("update").start()
    // batch 1: u1 advances 0->2; u3 has events but no signup -> silent
    input.addData(
      ev(1, "2024-01-01 09:00:00", 1, "signup"),
      ev(2, "2024-01-01 09:10:00", 1, "view"),
      ev(3, "2024-01-01 09:00:00", 3, "view"))
    q.processAllAvailable()
    val afterB1 = spark.table("funnel_cdc").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("reached"))).toSeq
    assert(afterB1 == Seq((1L, 2)), s"got ${afterB1.toList}")
    // batch 2: u1 advances 2->4; u3 STILL stuck -> still silent
    input.addData(
      ev(4, "2024-01-01 11:00:00", 1, "click"),
      ev(5, "2024-01-01 11:30:00", 1, "purchase"),
      ev(6, "2024-01-01 11:00:00", 3, "click"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("funnel_cdc").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("reached"))).toSet
    assert(all == Set((1L, 2), (1L, 4)), s"got $all")
  }

  test("streamingFunnelExpiring: state expires at the deadline, final depth emitted once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    def ev(id: Long, t: String, u: Long, et: String) =
      StatefulOps.Ev(id, Timestamp.valueOf(t), u, et, 0.0)
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingFunnelExpiring(
        input.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("funnel_exp").outputMode("update").start()
    // u1 enters the funnel (depth 2); u3 has events but never signs up
    input.addData(
      ev(1, "2024-01-01 09:00:00", 1, "signup"),
      ev(2, "2024-01-01 09:10:00", 1, "view"),
      ev(3, "2024-01-01 09:00:00", 3, "view"))
    q.processAllAvailable()
    // watermark jumps past u1's 72h deadline (2024-01-04 09:00)
    input.addData(ev(4, "2024-01-10 00:00:00", 9, "signup"))
    q.processAllAvailable()
    // one more batch so the timeout (evaluated against the advanced
    // watermark) actually fires
    input.addData(ev(5, "2024-01-10 00:00:01", 9, "view"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_exp").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("reached"))).toSeq
    // exactly one final row for u1 at its frozen depth; u3 expired
    // silently (never in the funnel); u9 is still live (no row)
    assert(rows == Seq((1L, 2)), s"got ${rows.toList}")
  }

  test("streamingSessions: gap-close and watermark-close, interval parity with session_window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.sql.Timestamp
    def ev(id: Long, t: String, u: Long) =
      StatefulOps.Ev(id, Timestamp.valueOf(t), u, "view", 0.0)
    val batch1 = Seq(
      ev(1, "2024-01-01 09:00:00", 1),
      ev(2, "2024-01-01 09:10:00", 1), // extends u1's open session
      ev(4, "2024-01-01 09:05:00", 2))
    val batch2 = Seq(
      ev(3, "2024-01-01 10:00:00", 1)) // 50 min gap -> closes the first
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingSessions(
        input.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    // advance the watermark far past everything, then one more batch
    // so the timeouts actually fire (the funnel-expiry harness)
    input.addData(ev(9, "2024-01-02 12:00:00", 99)); q.processAllAvailable()
    input.addData(ev(10, "2024-01-02 12:30:01", 99)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s_us"),
        r.getAs[Long]("e_us"))).toSet
    // batch reference: session_window over ALL replayed events; the
    // only session missing from the stream is u99's LAST one (still
    // open at stop — its 12:30:01 sentinel never gapped out)
    val all = (batch1 ++ batch2 ++ Seq(
      ev(9, "2024-01-02 12:00:00", 99), ev(10, "2024-01-02 12:30:01", 99)))
      .toDS()
    val batch = all
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stillOpen = batch.filter(_._1 == 99L).maxBy(_._2)
    assert(streamed == batch - stillOpen,
      s"streamed=$streamed batch=$batch open=$stillOpen")
    // u1 x2 (one gap-closed, one expired), u2 expired, u99 gap-closed
    assert(streamed.size == 4)
  }

  test("TopKAggregator: bounded buffer, tie-break on smaller id, merge keeps global best") {
    val a = new graft.functions.TopKAggregator(3)
    val fed = Seq((0.5, 10L), (0.9, 3L), (0.9, 1L), (0.1, 7L), (0.7, 2L))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(fed) == Seq((0.9, 1L), (0.9, 3L), (0.7, 2L)))
    assert(fed.length == 3) // never grows past k
    val other = Seq((0.95, 9L), (0.2, 4L)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(fed, other)) == Seq((0.95, 9L), (0.9, 1L), (0.9, 3L)))
    assert(a.finish(a.merge(a.zero, other)) == Seq((0.95, 9L), (0.2, 4L)))
  }

  test("q_sim_topk via TopKAggregator equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(expr("cosine_sim(qv, nv)"), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaAgg = SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("q_sketch_merge: per-level bound flags hold and the merge identity is true") {
    val rows = SparkEntry.queries("q_sketch_merge")(spark, sf).collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        ((r.getAs[Long]("exact_distinct"), r.getAs[Boolean]("est_within_5pct"),
          r.getAs[Boolean]("merge_tracks_rebuild")))).toMap
    assert(rows.size >= 2)
    rows.foreach { case (k, (exact, within, merged)) =>
      assert(exact > 0, s"nation $k")
      assert(within, s"nation $k: HLL estimate strayed past 5% of $exact")
      assert(merged, s"nation $k: union-of-partials strayed >2% from rebuild")
    }
    // the merged row must be consistent with the parts: exact sum
    val parts = rows.removed(-1L)
    assert(rows(-1L)._1 == parts.values.map(_._1).sum)
    // and the raw estimates themselves stay pinned: the 25-way union
    // tracks the one-pass sketch (post-union the composite estimator
    // replaces HIP, so equality is NOT expected — a 2% band is)
    import org.apache.spark.sql.functions._
    val perNation = Tables.customer(spark, sf).groupBy(col("c_nationkey"))
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
    val viaUnion = perNation
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val direct = Tables.customer(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey")))).head().getLong(0)
    assert(math.abs(viaUnion - direct) * 100 <= direct * 2,
      s"union=$viaUnion direct=$direct")
  }

  test("q_sketch_exact: oracle-checked twin agrees with q_sketch_merge's exact columns") {
    val exact = SparkEntry.queries("q_sketch_exact")(spark, sf).collect()
      .map(r => r.getAs[Long]("c_nationkey") -> r.getAs[Long]("exact_distinct")).toMap
    val merged = SparkEntry.queries("q_sketch_merge")(spark, sf).collect()
    assert(exact.size == merged.length)
    merged.foreach { r =>
      assert(exact(r.getAs[Long]("c_nationkey")) == r.getAs[Long]("exact_distinct"))
    }
  }

  test("q_agg_approx: bound flags hold and exacts agree with q_agg_distinct") {
    val row = SparkEntry.queries("q_agg_approx")(spark, sf).head()
    assert(row.getAs[Boolean]("parts_within_5pct"),
      "l_partkey HLL estimate strayed past 5% of exact")
    assert(row.getAs[Boolean]("orders_within_5pct"),
      "l_orderkey HLL estimate strayed past 5% of exact")
    val exact = SparkEntry.queries("q_agg_distinct")(spark, sf).head()
    assert(row.getAs[Long]("exact_parts") == exact.getAs[Long]("n_parts"))
    assert(row.getAs[Long]("exact_orders") == exact.getAs[Long]("n_orders"))
    // pin the raw rsd=1% estimates directly (the query's verified
    // surface carries only the bound flags)
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val ap = li.agg(approx_count_distinct(col("l_partkey"), 0.01)).head().getLong(0)
    assert(math.abs(ap - exact.getAs[Long]("n_parts")).toDouble /
      exact.getAs[Long]("n_parts") < 0.05, s"raw estimate $ap")
  }

  test("q_join_outer: both null-extensions carry rows") {
    val rows = SparkEntry.queries("q_join_outer")(spark, sf).collect()
    assert(rows.exists(_.isNullAt(1)), "no right-only rows (c_name null)")
    assert(rows.exists(_.isNullAt(2)), "no left-only rows (n_orders null)")
    assert(rows.forall(!_.isNullAt(0))) // coalesced key never null
  }

  test("streamingDistinct: bounded KMV state across micro-batches equals a flat sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.functions.KmvAggregator
    val k = 32
    val input = MemoryStream[(String, String)]
    val q = StatefulOps.streamingDistinct(input.toDS(), k)
      .writeStream.format("memory").queryName("kmv_stream").outputMode("update").start()
    // batch 1: 20 distinct under key a (below k: exact), 40 under b
    input.addData((1 to 20).map(i => ("a", s"v$i")) ++ (1 to 40).map(i => ("b", s"w$i")): _*)
    q.processAllAvailable()
    // batch 2: overlap + new values; state must carry over and dedup
    input.addData((11 to 30).map(i => ("a", s"v$i")) ++ (30 to 80).map(i => ("b", s"w$i")): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("kmv_stream").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rs) => key -> rs.last }
    // reference: flat sketch over the distinct union, same hash + estimator
    def expected(values: Seq[String]): (Long, Double) = {
      val hs = values.map(KmvAggregator.hash60).distinct.sorted.take(k)
      val est =
        if (hs.length < k) hs.length.toDouble
        // HALF_UP at scale 4 = Spark's round(x, 4) = the batch
        // q_sketch_kmv estimate — streaming/batch parity covers the
        // estimate, not just the sketch array
        else BigDecimal((k - 1) * 1152921504606846976.0 / hs(k - 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (hs.length.toLong, est)
    }
    val expA = expected((1 to 30).map(i => s"v$i"))
    val expB = expected((1 to 80).map(i => s"w$i"))
    assert((last("a").getAs[Long]("n_kept"), last("a").getAs[Double]("approx_distinct")) == expA)
    assert((last("b").getAs[Long]("n_kept"), last("b").getAs[Double]("approx_distinct")) == expB)
    assert(expA._2 == 30.0, "key a is below k: estimate must be exact")
    val errB = math.abs(expB._2 - 80.0) / 80.0
    assert(errB < 0.6, s"key b estimate off: ${expB._2}")
  }

  test("streamingHeavyHitters: MG guarantee holds at every batch boundary, state stays bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // two keyed Zipf-ish streams, value vNN appears ceil(120/NN) times
    val mk = (key: String) =>
      (1 to 30).flatMap(i => Seq.fill((120 + i - 1) / i)((key, f"v$i%02d")))
    val all = (mk("g1") ++ mk("g2")).sortBy(_._2) // deterministic slicing
    val input = MemoryStream[(String, String)]
    // capture per-batch output keyed by batch id — update-mode rows
    // from the memory sink carry no contractual collect() order, so
    // "latest state" must be read off the max batch id, not row order
    val byBatch = scala.collection.concurrent.TrieMap
      .empty[Long, Array[org.apache.spark.sql.Row]]
    // val of explicit function type disambiguates the Scala-vs-Java
    // foreachBatch overloads (the standard 2.13 workaround)
    val capture: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (ds, batchId) => { byBatch(batchId) = ds.collect(); () }
    val q = graft.streaming.StatefulOps.streamingHeavyHitters(input.toDS(), 8)
      .toDF().writeStream.outputMode("update")
      .foreachBatch(capture)
      .start()
    val batches = all.grouped((all.length + 2) / 3).toSeq
    var seen = Seq.empty[(String, String)]
    batches.foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
      seen ++= b
      val n = seen.count(_._1 == "g1").toLong
      val truth = seen.filter(_._1 == "g1").groupBy(_._2)
        .map { case (v, xs) => v -> xs.length.toLong }
      // each update-mode batch emits at most ONE row per key: the g1
      // row of the newest batch containing one is the latest state
      val counters = byBatch.toSeq.sortBy(_._1).reverse
        .flatMap(_._2.find(_.getAs[String]("key") == "g1"))
        .head.getMap[String, Long](1)
      assert(counters.size <= 8, "state exceeded k")
      truth.foreach { case (v, t) =>
        counters.get(v).foreach(est => assert(est <= t && est >= t - n / 9,
          s"band violated mid-stream for $v: est=$est true=$t n=$n"))
        if (t > n / 9) assert(counters.contains(v), s"heavy $v lost mid-stream")
      }
    }
    q.stop()
  }

  test("streamingWeightedSample is bit-identical to the batch ES selection at every boundary") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val k = 8
    // the feed carries the SHARED batch key spelling (esLnuFp/esKeyExpr)
    val feed = graft.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        graft.queries.SampleOps.esLnuFp(col("doc_id")).as("lnu_fp"))
      .select(col("lang"), col("doc_id"), expr(graft.queries.SampleOps.esKeyExpr))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val input = MemoryStream[(String, Long, Long)]
    val byBatch = scala.collection.concurrent.TrieMap
      .empty[Long, Array[org.apache.spark.sql.Row]]
    val capture: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (ds, batchId) => { byBatch(batchId) = ds.collect(); () }
    val q = StatefulOps.streamingWeightedSample(input.toDS(), k)
      .toDF().writeStream.outputMode("update").foreachBatch(capture).start()
    // adversarial slicing: interleave by index so every lang spans batches
    val slices = (0 until 3).map(i => feed.zipWithIndex.collect {
      case (row, idx) if idx % 3 == i => row
    })
    var seen = Seq.empty[(String, Long, Long)]
    slices.foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
      seen ++= b
      val expected = seen.groupBy(_._1).map { case (lang, rows) =>
        lang -> rows.map(r => (r._3, r._2)).distinct.sorted.take(k)
      }
      val latest = byBatch.toSeq.sortBy(_._1).flatMap { case (bid, rows) =>
        rows.map(r => r.getAs[String]("key") -> ((bid, r)))
      }.groupBy(_._1).map { case (lang, xs) => lang -> xs.maxBy(_._2._1)._2._2 }
      expected.foreach { case (lang, exp) =>
        val row = latest(lang)
        assert(row.getAs[scala.collection.Seq[Long]]("ids").toSeq == exp.map(_._2), s"$lang ids")
        assert(row.getAs[scala.collection.Seq[Long]]("keys_fp").toSeq == exp.map(_._1), s"$lang keys")
      }
    }
    q.stop()
    // single-group stream equals the BATCH operator's rows exactly
    val input2 = MemoryStream[(String, Long, Long)]
    val byBatch2 = scala.collection.concurrent.TrieMap
      .empty[Long, Array[org.apache.spark.sql.Row]]
    val capture2: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (ds, batchId) => { byBatch2(batchId) = ds.collect(); () }
    val q2 = StatefulOps.streamingWeightedSample(input2.toDS(), k)
      .toDF().writeStream.outputMode("update").foreachBatch(capture2).start()
    val (h1, h2) = feed.map(r => ("g", r._2, r._3)).splitAt(feed.length / 2)
    input2.addData(h1: _*); q2.processAllAvailable()
    input2.addData(h2: _*); q2.processAllAvailable()
    q2.stop()
    val streamed = byBatch2(byBatch2.keys.max).head.getAs[scala.collection.Seq[Long]]("ids").toSeq
    val batchIds = graft.queries.SampleOps.q_sample_es(spark, sf, k).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(streamed == batchIds,
      s"stream/batch ES selection diverged: $streamed vs $batchIds")
  }

  test("streaming KMV rows equal the batch q_sketch_kmv rows (SURVEY §2.10 parity invariant)") {
    // the strongest streaming correctness claim in the repo: the
    // stateful stream over the SAME values produces the batch
    // operator's exact output — sketch size AND rounded estimate —
    // because both share hash60 and (since the HALF_UP fix) the same
    // rounding. A batch backfill can therefore seed streaming state
    // with no estimate drift at the handoff.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = SparkEntry.queries("q_sketch_kmv")(spark, sf).collect()
      .filter(_.getAs[Long]("c_nationkey") >= 0) // drop the global merge row
      .map(r => r.getAs[Long]("c_nationkey") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Double]("approx_distinct")))).toMap
    val pairs = Tables.customer(spark, sf).select("c_nationkey", "c_custkey")
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSeq
    val input = MemoryStream[(String, String)]
    val q = StatefulOps.streamingDistinct(input.toDS(), 32)
      .writeStream.format("memory").queryName("kmv_parity").outputMode("update").start()
    val (b1, b2) = pairs.splitAt(pairs.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_parity").collect()
      .groupBy(_.getAs[String]("key"))
      .map { case (key, rs) =>
        key.toLong -> ((rs.last.getAs[Long]("n_kept"), rs.last.getAs[Double]("approx_distinct"))) }
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (key, got) =>
      assert(got == batch(key), s"nation $key: streaming $got != batch ${batch(key)}")
    }
  }

  test("KmvAggregator keeps the k smallest distinct values; merge level equals a flat build") {
    import spark.implicits._
    // duplicated values spread over 8 partitions: dedup and the k cap
    // must both survive partial merges
    val pairs = (1L to 500L).map(i => (i % 5, i % 200))
    val df = pairs.toDF("g", "v").repartition(8)
    val kmv = graft.functions.KmvAggregator.kmv(16)
    val per = df.groupBy("g").agg(kmv(col("v")).as("sk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exact = pairs.distinct.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).distinct.sorted.take(16).toSeq }
    per.foreach { case (g, sk) => assert(sk == exact(g), s"group $g: $sk") }
    // union level over finished sketch arrays == one flat sketch
    val merged = df.groupBy("g").agg(kmv(col("v")).as("sk"))
      .agg(graft.functions.KmvAggregator.kmvMerge(16)(col("sk")).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(merged == pairs.map(_._2).distinct.sorted.take(16).toSeq)
  }

  test("q_sketch_kmv: unsaturated rows are exact, saturated estimates track the truth") {
    val exact = SparkEntry.queries("q_sketch_exact")(spark, sf).collect()
      .map(r => r.getAs[Long]("c_nationkey") -> r.getAs[Long]("exact_distinct")).toMap
    val rows = SparkEntry.queries("q_sketch_kmv")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("c_nationkey")).toSet == exact.keySet)
    rows.foreach { r =>
      val nk  = r.getAs[Long]("n_kept")
      val est = r.getAs[Double]("approx_distinct")
      val ex  = exact(r.getAs[Long]("c_nationkey"))
      if (nk < 32) assert(est == ex.toDouble, s"unsaturated sketch must be exact: $r")
      else assert(math.abs(est - ex) / ex < 0.6, // ~3σ for k=32
        s"nation ${r.getAs[Long]("c_nationkey")}: estimate $est vs exact $ex")
    }
  }

  test("q_approx_pct: histogram estimates land within one bin width of exact") {
    val approx = SparkEntry.queries("q_approx_pct")(spark, sf).collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[Double]("approx_value")).toMap
    assert(approx.keySet == Set(0.5, 0.95, 0.99))
    val prices = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val width = 110000.0 / 64
    approx.foreach { case (p, est) =>
      // rank definition matching the histogram's cum >= p*total: the
      // ceil(p*N)-th element (1-based) — NOT floor-index, which for
      // integral p*N points at the next element, possibly across an
      // empty-bin gap
      val k = math.max(1, math.ceil(p * prices.length).toInt)
      val exact = prices(k - 1)
      assert(math.abs(est - exact) <= width,
        s"p$p: approx $est vs exact $exact (bin width $width)")
    }
  }

  test("IVF results carry exact cosines and consistent ranks") {
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    ivf.foreach { r =>
      val exact = BigDecimal(cos(vecs(r.getAs[Long]("query_id")), vecs(r.getAs[Long]("neighbor_id"))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("cosine") - exact) < 1e-9)
    }
    ivf.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("streamingTransitions reproduces the batch transition multiset over an ordered replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, TestSpark.sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => StatefulOps.Ev(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue).getOrElse(0.0)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingTransitions(input.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_stream").collect()
      .groupBy(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")))
      .view.mapValues(_.length.toLong).toMap
    val batch = SparkEntry.queries("q_transitions")(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        r.getAs[Long]("n")).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamingAttribution credits aggregate to the batch q_attribution report") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, TestSpark.sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => StatefulOps.Ev(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue).getOrElse(0.0)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingAttribution(input.toDS())
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_stream").collect()
      .groupBy(r => (r.getAs[String]("model"), r.getAs[String]("touch_type")))
      .view.mapValues(rs =>
        (rs.length.toLong, rs.map(_.getAs[Long]("cents")).sum)).toMap
    val batch = SparkEntry.queries("q_attribution")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("touch_type")) ->
        ((r.getAs[Long]("n_conv"), r.getAs[Long]("revenue_cents")))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamingSpikes equals batch q_spikes hour-for-hour over an ordered replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real corpus events, arrival-ordered, replayed in two batches
    val evs = Tables.events(spark, TestSpark.sf)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => StatefulOps.Ev(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue).getOrElse(0.0)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.streamingSpikes(input.toDS())
      .writeStream.format("memory").queryName("spikes_stream")
      .outputMode("append").start()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("spikes_stream").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w"), r.getAs[Boolean]("is_spike"))))
      .toMap
    val batchRows = SparkEntry.queries("q_spikes")(spark, TestSpark.sf).collect()
    // streaming cannot emit each type's final (never-completed) hour
    val lastHr = batchRows.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("hr")).max }
    val expected = batchRows
      .filter(r => r.getAs[Long]("hr") <
        lastHr(r.getAs[String]("event_type")))
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w"), r.getAs[Boolean]("is_spike"))))
      .toMap
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }
}
