package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TimeSeries

/** Fixture tests for the events-analytics keys (q_retention,
  * q_funnel) — hand-computed cohort matrices and greedy funnel chains
  * including the semantic fine print the oracle also encodes:
  * first-signup anchoring, the 72 h deadline, strict timestamp
  * ordering, and stage monotonicity.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("retentionOf: hand-built cohort matrix (two cohorts, gaps, rates)") {
    import spark.implicits._
    val ud = Seq(
      (1L, 100L), (1L, 101L), (1L, 103L),
      (2L, 100L), (2L, 101L), (2L, 100L), // duplicate activity rows collapse
      (3L, 101L)
    ).toDF("user_id", "day")
    val got = TimeSeries.retentionOf(ud).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (100L, 0L, 2L, 2L, 1000000L),
      (100L, 1L, 2L, 2L, 1000000L),
      (100L, 3L, 1L, 2L, 500000L),
      (101L, 0L, 1L, 1L, 1000000L)))
  }

  test("funnelOf: ordering, deadline, first-signup anchor, strictness") {
    import spark.implicits._
    val W = TimeSeries.FunnelWindowMicros
    val ev = Seq(
      // user 1: full ordered chain inside the window -> reached 4
      (1L, "signup", 0L), (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: purchase BEFORE click -> chain stops at view (reached 2)
      (2L, "signup", 0L), (2L, "view", 5L), (2L, "purchase", 3L),
      // user 3: view lands 1us past the 72h deadline -> reached 1
      (3L, "signup", 0L), (3L, "view", W + 1L),
      // user 4: no signup at all -> not in the funnel
      (4L, "view", 0L), (4L, "click", 1L), (4L, "purchase", 2L),
      // user 5: deadline anchors at the FIRST signup, not a later one
      (5L, "signup", 0L), (5L, "signup", 400000000000L), (5L, "view", 400000000010L),
      // user 6: equal timestamps cannot chain (strict >)
      (6L, "signup", 100L), (6L, "view", 100L),
      // noise event type is ignored entirely
      (1L, "error", 15L)
    ).toDF("user_id", "event_type", "tu")
    val got = TimeSeries.funnelOf(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "signup", 5L, 1000000L, 1000000L),
      (2L, "view", 2L, 400000L, 400000L),
      (3L, "click", 1L, 500000L, 200000L),
      (4L, "purchase", 1L, 1000000L, 200000L)))
  }

  test("funnelOf: empty input and no-signup corpus both yield empty reports") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("user_id", "event_type", "tu")
    assert(TimeSeries.funnelOf(empty).collect().isEmpty)
    val noSignup = Seq((1L, "view", 0L), (1L, "click", 1L))
      .toDF("user_id", "event_type", "tu")
    assert(TimeSeries.funnelOf(noSignup).collect().isEmpty)
  }

  test("q_funnel invariants on the corpus: contiguous stages, monotone counts") {
    val rows = q("q_funnel").collect()
    assert(rows.nonEmpty)
    val idx = rows.map(_.getLong(0))
    assert(idx.toSeq == (1L to idx.length).toSeq)
    val n = rows.map(_.getAs[Long]("n_users"))
    assert(n.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(rows.head.getAs[Long]("conv_prev_fp") == 1000000L)
  }

  test("q_outliers: hand-computed median/MAD on a planted fixture") {
    import spark.implicits._
    // type "a": values 1..7 plus one wild 100.00 -> median of
    // {1..7,100} (lower, n=8) = 4.00, deviations {3,2,1,0,1,2,3,96}
    // sorted {0,1,1,2,2,3,3,96} -> lower median (n=8, 4th) = 2.00;
    // outliers: |c-400| > 3*200=600 -> only 100.00 (9600 > 600)
    val evs = ((1 to 7).map(v => (1L, "a", v.toDouble)) :+ ((8L, "a", 100.0)))
      .zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, t, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("outliers").toString
    evs.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.TimeSeries.q_outliers(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("median_c"), r.getAs[Long]("mad_c"),
          r.getAs[Long]("n_outliers"), r.getAs[Long]("outlier_share_fp")))).toMap
    assert(got == Map("a" -> ((8L, 400L, 200L, 1L, 125000L))))
  }

  test("q_outliers corpus invariants: outliers bounded, MAD <= spread") {
    val rows = q("q_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n"),
        "breakdown: a robust gate can never flag a majority")
      assert(r.getAs[Long]("mad_c") >= 0 && r.getAs[Long]("median_c") >= 0)
    }
  }

  test("q_skew_stats: hand-computed concentration metrics on a planted skew") {
    import spark.implicits._
    // keys: 1 -> 6 rows, 2 -> 2, 3 -> 2  (N=10, K=3)
    val li = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L))
      .zipWithIndex.map { case (k, i) => (i.toLong, k, 1L) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("skew").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.Relational.q_skew_stats(spark, tmp).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    assert(got == Map(
      "n_rows" -> 10L, "n_keys" -> 3L, "max_key_n" -> 6L,
      "top1_share_fp" -> 600000L,
      // HHI = (36+4+4)/100 = 0.44
      "hhi_fp" -> 440000L,
      // count distribution {2,2,6}: p50 = 2 (cum 2/3 keys), p99 = 6
      "p50_key_n" -> 2L, "p99_key_n" -> 6L))
  }

  test("q_retention invariants on the corpus: offset 0 is full retention") {
    val rows = q("q_retention").collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("day_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_cohort"))
      assert(r.getAs[Long]("retention_fp") == 1000000L)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
    }
  }

  test("q_value_hist: buckets partition the range; counts reconcile per type") {
    val rows = TimeSeries.q_value_hist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 32)
      assert(r.getAs[Long]("lo_c") <= r.getAs[Long]("hi_c"))
      assert(r.getAs[Long]("n") > 0)
    }
    // per-type totals equal the non-null value counts
    val expected = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    val got = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("n")).sum }
    assert(got == expected)
    // bucket edges are the same deterministic function for every type:
    // same (bucket -> lo_c/hi_c) mapping wherever a bucket appears
    val edges = rows.groupBy(_.getAs[Long]("bucket")).values
    edges.foreach { rs =>
      assert(rs.map(r => (r.getAs[Long]("lo_c"), r.getAs[Long]("hi_c"))).toSet.size == 1)
    }
  }

  test("scd2Of: run collapse, validity intervals, same-day flip, is_current") {
    import spark.implicits._
    val st = Seq(
      // cust 1: O@d10, O@d11 (run collapses), F@d12, O@d15 -> 3 versions
      (1L, 10L, 100L, "O"), (1L, 11L, 101L, "O"),
      (1L, 12L, 102L, "F"), (1L, 15L, 103L, "O"),
      // cust 2: same-day status flip resolved by order key ->
      // zero-length first version [20, 20), current from day 20
      (2L, 20L, 200L, "P"), (2L, 20L, 201L, "F"),
      // cust 3: single order -> one open current version
      (3L, 30L, 300L, "O")
    ).toDF("o_custkey", "day", "o_orderkey", "status")
    val got = graft.queries.Windows.scd2Of(st).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "O", 10L, Some(12L), 0L),
      (1L, 2L, "F", 12L, Some(15L), 0L),
      (1L, 3L, "O", 15L, None, 1L),
      (2L, 1L, "P", 20L, Some(20L), 0L),
      (2L, 2L, "F", 20L, None, 1L),
      (3L, 1L, "O", 30L, None, 1L)))
    // the graded key: exactly one current version per customer, and
    // intervals chain (valid_to of version k == valid_from of k+1)
    val rows = q("q_scd2").collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { vs =>
      assert(vs.count(_.getAs[Long]("is_current") == 1L) == 1)
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_day") == b.getAs[Long]("valid_from_day"))
          assert(a.getAs[String]("status") != b.getAs[String]("status"))
        case _ => ()
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_day")))
    }
  }

  test("q_scd2_lookup: every order maps to exactly one dimension version") {
    import spark.implicits._
    // planted timeline: cust 1 is O on days [10,12), F from day 12
    val tmp = java.nio.file.Files.createTempDirectory("scd2l").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    Seq(
      (100L, 1L, "O", 10.0, ts(10), "1-URGENT"),
      (101L, 1L, "O", 10.0, ts(11), "1-URGENT"), // same status, no new version
      (102L, 1L, "F", 10.0, ts(12), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = SparkEntry.queries("q_scd2_lookup")(spark, tmp).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("version"), r.getAs[String]("status"))))
      .toMap
    assert(got == Map(
      100L -> ((1L, "O")), 101L -> ((1L, "O")), 102L -> ((2L, "F"))))
    // corpus: the interval set partitions each customer's timeline —
    // one matched version per order, no order lost or duplicated
    val rows = SparkEntry.queries("q_scd2_lookup")(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.length.toLong == nOrders)
    assert(rows.map(_.getAs[Long]("o_orderkey")).distinct.length == rows.length)
  }

  test("q_spikes: flags equal an independent driver-side trailing-window recompute") {
    val rows = q("q_spikes").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("hr"))
      val ns = sorted.map(_.getAs[Long]("n"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = ns.slice(math.max(0, i - 24), i)
        val (w, s0, q0) = (win.length.toLong, win.sum, win.map(x => x * x).sum)
        val n = r.getAs[Long]("n")
        assert(r.getAs[Long]("w") == w)
        val expect = w >= 12 &&
          (w * n - s0) * (w * n - s0) > 9L * (w * q0 - s0 * s0) &&
          n * w > s0
        assert(r.getAs[Boolean]("is_spike") == expect, s"row $r")
      }
    }
  }

  test("q_rfm: scores match a driver-side position-quintile recompute") {
    val rows = q("q_rfm").collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    def score(order: Array[Long]): Map[Long, Long] =
      order.zipWithIndex.map { case (u, i) => u -> ((i.toLong * 5L) / n + 1L) }.toMap
    val byR = score(rows.sortBy(r =>
      (r.getAs[Long]("recency_days"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("user_id")))
    val byF = score(rows.sortBy(r =>
      (r.getAs[Long]("frequency"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("user_id")))
    val byM = score(rows.sortBy(r =>
      (r.getAs[Long]("monetary_c"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("user_id")))
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("r_score") == 6L - byR(u))
      assert(r.getAs[Long]("f_score") == byF(u))
      assert(r.getAs[Long]("m_score") == byM(u))
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(r.getAs[Long]("rfm_code") == rs * 100 + fs * 10 + ms)
      assert(r.getAs[Long]("recency_days") >= 0L)
    }
    // the most recent purchaser anchors recency 0; quintiles balanced
    assert(rows.map(_.getAs[Long]("recency_days")).min == 0L)
    val fCounts = rows.groupBy(_.getAs[Long]("f_score")).view.mapValues(_.length)
    assert(fCounts.values.max - fCounts.values.min <= (n / 5 + 1).toInt)
  }

  test("q_transitions: row-stochastic matrix over exactly N - U transitions") {
    val rows = q("q_transitions").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user with k events contributes k-1 transitions
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    // rows are probability-normalized per prev_type up to fp rounding
    rows.groupBy(_.getAs[String]("prev_type")).values.foreach { rs =>
      val pSum = rs.map(_.getAs[Long]("p_fp")).sum
      assert(math.abs(pSum - 1000000L) <= rs.length / 2 + 1,
        s"row sum $pSum over ${rs.length} cells")
      rs.foreach(r => assert(r.getAs[Long]("n") > 0L))
    }
  }

  test("attributionOf: first/last credit, (none) fallback, same-tu tie-break") {
    import spark.implicits._
    // user 1: view(t1) click(t2) purchase(t3) signup(t4) purchase(t5)
    //   -> p3: first=view last=click; p5: first=view last=signup
    // user 2: purchase with no prior touch -> (none)/(none)
    // user 3: touch at the SAME tu as the purchase, smaller event_id
    //   -> counts (strict (tu, event_id) order); larger-id touch at the
    //      same tu must NOT count
    val ev = Seq(
      (1L, 10L, "view", 100L, 0L), (1L, 11L, "click", 200L, 0L),
      (1L, 12L, "purchase", 300L, 1000L), (1L, 13L, "signup", 400L, 0L),
      (1L, 14L, "purchase", 500L, 2000L),
      (2L, 20L, "purchase", 100L, 700L),
      (3L, 30L, "click", 100L, 0L), (3L, 31L, "purchase", 100L, 500L),
      (3L, 32L, "view", 100L, 0L))
      .toDF("user_id", "event_id", "event_type", "tu", "cents")
    val rows = TimeSeries.attributionOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_conv"), r.getAs[Long]("revenue_cents"))).toMap
    assert(rows(("first", "view")) == (2L, 3000L))
    assert(rows(("first", "(none)")) == (1L, 700L))
    assert(rows(("first", "click")) == (1L, 500L))
    assert(rows(("last", "click")) == (2L, 1500L))
    assert(rows(("last", "signup")) == (1L, 2000L))
    assert(rows(("last", "(none)")) == (1L, 700L))
    // both models' totals reconcile to the purchase count and revenue
    Seq("first", "last").foreach { m =>
      val mrows = rows.filter(_._1._1 == m).values
      assert(mrows.map(_._1).sum == 4L && mrows.map(_._2).sum == 4200L)
    }
  }

  test("q_attribution corpus invariants: models reconcile to purchases") {
    val rows = q("q_attribution").collect()
    val ev = Tables.events(spark, sf)
    val nP = ev.filter(col("event_type") === "purchase").count()
    Seq("first", "last").foreach { m =>
      val mrows = rows.filter(_.getAs[String]("model") == m)
      assert(mrows.map(_.getAs[Long]("n_conv")).sum == nP)
    }
  }

  test("sessionPathsOf: gap split, in-session order, deterministic top cut") {
    import spark.implicits._
    val G = 1800L * 1000000L
    val ev = Seq(
      // user 1: [view, click] then a fresh session [purchase]
      (1L, 10L, "view", 0L), (1L, 11L, "click", 10L * 1000000L),
      (1L, 12L, "purchase", 2 * G + 100L),
      // user 2: same two-event path; same-tu order pinned by event_id
      (2L, 20L, "view", 50L), (2L, 21L, "click", 50L),
      // user 3: singleton
      (3L, 30L, "purchase", 0L))
      .toDF("user_id", "event_id", "event_type", "tu")
    val rows = TimeSeries.sessionPathsOf(ev, 20).collect()
      .map(r => (r.getAs[Long]("rn"), r.getAs[String]("path"),
        r.getAs[Long]("n_sessions")))
    assert(rows.toSeq == Seq((1L, "purchase", 2L), (2L, "view>click", 2L)))
  }

  test("q_basket equals a driver-side sessionize-and-pair recompute") {
    val rows = q("q_basket").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // sessionize: 30-min gap on the (tu, event_id)-sorted per-user run
    val baskets = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val out = scala.collection.mutable.ArrayBuffer[Set[String]]()
      var cur = Set.empty[String]
      var last = Long.MinValue
      sorted.foreach { e =>
        if (last != Long.MinValue && e._4 - last > 1800L * 1000000L) {
          out += cur; cur = Set.empty
        }
        cur += e._3; last = e._4
      }
      if (cur.nonEmpty) out += cur
      out
    }.toSeq
    val n = baskets.length.toLong
    val singles = baskets.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val pairCounts = baskets.flatMap(b =>
      b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == pairCounts.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_sessions") == n)
      assert(r.getAs[Long]("n_ab") == pairCounts(k))
      assert(r.getAs[Long]("n_a") == singles(k._1))
      assert(r.getAs[Long]("n_b") == singles(k._2))
      val lift = (BigInt(2) * pairCounts(k) * n * 1000000 +
        BigInt(singles(k._1)) * singles(k._2)) /
        (BigInt(2) * singles(k._1) * singles(k._2))
      assert(r.getAs[Long]("lift_fp") == lift.toLong)
    }
  }

  test("q_bootstrap: CI equals an independent driver-side Poisson recompute") {
    val out = q("q_bootstrap").collect()
    assert(out.nonEmpty)
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val base = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), cents.as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u52(eid: Long, rep: Int): Long = {
      val hex = md.digest(s"$eid:$rep".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(eid: Long, rep: Int): Long = {
      val u = u52(eid, rep)
      val i = TimeSeries.PoissonThresholds.indexWhere(u < _)
      if (i < 0) 8L else i.toLong
    }
    def div(a: BigInt, b: BigInt): Long = (a / b).toLong // operands > 0
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rows = base.filter(_._1 == t)
      val n = rows.length.toLong
      val s = rows.map(_._3).sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("mean_fp") ==
        div(BigInt(2) * s * 10000 + n, BigInt(2) * n))
      val means = (0 until 32).flatMap { rep =>
        val num = rows.map { case (_, eid, c) => weight(eid, rep) * c }.sum
        val den = rows.map { case (_, eid, _) => weight(eid, rep) }.sum
        if (den == 0) None
        else Some((div(BigInt(2) * num * 10000 + den, BigInt(2) * den), rep))
      }.sorted
      assert(r.getAs[Long]("boot_lo_fp") == means(1)._1)
      assert(r.getAs[Long]("boot_hi_fp") == means(means.length - 2)._1)
      assert(means(1)._1 <= means(means.length - 2)._1)
    }
  }

  test("q_ohlc: bars replay from raw ticks; low <= open/close <= high; counts conserve") {
    import org.apache.spark.sql.functions.{col, unix_timestamp, date_trunc}
    val bars = q("q_ohlc").collect()
      .map(r => (r.getAs[Long]("w_start"), r.getAs[String]("event_type")) -> r).toMap
    val ticks = Tables.events(spark, sf)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("w"),
        col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map { r =>
        val cents = Option(r.get(4)).map(_ =>
          (BigDecimal(r.getAs[Double]("value")).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
        val t = r.getAs[java.sql.Timestamp]("ts")
        val micros = t.getTime / 1000 * 1000000L + t.getNanos / 1000 // full µs order
        ((r.getAs[Long]("w"), r.getAs[String]("event_type")),
          (micros, r.getAs[Long]("event_id"), cents))
      }
    assert(bars.keySet == ticks.map(_._1).toSet)
    ticks.groupBy(_._1).foreach { case (key, ts0) =>
      val r = bars(key)
      val sorted = ts0.map(_._2).sortBy(t => (t._1, t._2))
      assert(r.getAs[Long]("n") == ts0.length.toLong)
      def cmp(name: String, v: Option[Long]): Unit = v match {
        case Some(x) => assert(r.getAs[Long](name) == x, s"$key $name")
        case None => assert(r.isNullAt(r.fieldIndex(name)), s"$key $name null")
      }
      cmp("open_cents", sorted.head._3)
      cmp("close_cents", sorted.last._3)
      val vals = sorted.flatMap(_._3)
      cmp("high_cents", if (vals.isEmpty) None else Some(vals.max))
      cmp("low_cents", if (vals.isEmpty) None else Some(vals.min))
      vals.headOption.foreach { _ =>
        assert(r.getAs[Long]("low_cents") <= r.getAs[Long]("high_cents"))
      }
    }
  }
}
