package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupOps, TextOps, TimeSeries}

/** Fixture tests for the round-9 statistical/time-series additions
  * (q_trend, q_acf, q_seasonality, q_mannwhitney, q_dedup_sorted) —
  * hand-computed OLS moments, a sign-carrying autocorrelation, the
  * arithmetic day-of-week, tie-exact rank sums, and the SNM blocking
  * semantics (same-block window pairs compared, cross-block near-dups
  * invisible by construction).
  */
class StatTrendSpec extends AnyFunSuite {
  import TestSpark._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("trendOf: hand-computed moments, slope, intercept, r2 with a zero-filled gap day") {
    import spark.implicits._
    // days 10,12 observed; day 11 is a spine zero: y = (5, 0, 9)
    val dc = Seq((10L, 5L), (12L, 9L)).toDF("day", "y")
    val r = TimeSeries.trendOf(dc).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 3L, 14L, 18L, 5L, 106L)))
    assert(r.getDouble(6) == 2.0)          // slope = 12/6
    assert(r.getDouble(7) == 2.666667)     // intercept = 16/6
    assert(r.getDouble(8) == 0.196721)     // r2 = 144/732
  }

  test("trendOf: single-day series reports NULL slope instead of dividing by zero") {
    import spark.implicits._
    val r = TimeSeries.trendOf(Seq((7L, 3L)).toDF("day", "y")).collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("acfOf: alternating series has acf(1) = -0.75 exactly (sign-carrying fixed point)") {
    import spark.implicits._
    // y = (1,3,1,3): n=4, S=8, n*y-S = (-4,4,-4,4), den=64,
    // lag-1 num = -16-16-16 = -48 -> acf = -0.75
    val hc = Seq((0L, 1L), (1L, 3L), (2L, 1L), (3L, 3L)).toDF("hr", "y")
    val rows = TimeSeries.acfOf(hc, 2).collect()
    assert(rows.length == 2)
    val lag1 = rows(0)
    assert(lag1.getLong(0) == 1L && lag1.getLong(1) == 3L)
    assert(lag1.getLong(2) == -48L && lag1.getLong(3) == 64L)
    assert(lag1.getLong(4) == -750000L)
    // lag 2: pairs (t0,t2),(t1,t3): 16+16 = 32 -> acf = +0.5
    assert(rows(1).getLong(2) == 32L && rows(1).getLong(4) == 500000L)
  }

  test("acfOf: a missing spine hour enters as a real zero") {
    import spark.implicits._
    // hours 0 and 2 observed, hour 1 absent -> series (2, 0, 2)
    val hc = Seq((0L, 2L), (2L, 2L)).toDF("hr", "y")
    val rows = TimeSeries.acfOf(hc, 1).collect()
    // n=3, S=4, n*y-S = (2,-4,2): den = 24, lag-1 num = -8-8 = -16
    assert(rows(0).getLong(1) == 2L)
    assert(rows(0).getLong(2) == -16L && rows(0).getLong(3) == 24L)
  }

  test("q_seasonality: dense 168 cells, counts conserve, arithmetic dow matches java.time") {
    val rows = q("q_seasonality").collect()
    assert(rows.length == 168)
    val total = rows.map(_.getLong(2)).sum
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total == nEvents)
    // lift is a weighted identity: sum over cells of n*lift_fp/total ~ 1e6
    // (checked loosely; exact identity holds pre-rounding)
    // arithmetic dow: recompute one occupied cell driver-side
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(unix_timestamp(col("ts")).as("es")).limit(1).collect()(0).getLong(0)
    val day = Math.floorDiv(ev, 86400L)
    val javaDow = java.time.LocalDate.ofEpochDay(day).getDayOfWeek.getValue % 7 // Sunday=0
    assert((day + 4) % 7 == javaDow)
  }

  test("mannWhitneyOf: tie-exact doubled U and z on a hand fixture") {
    import spark.implicits._
    // A = {1, 2, 2}, B = {2, 3}: U1 = 0 + 0.5 + 0.5 = 1 -> u2_en = 2
    val vals = Seq((1L, true), (2L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "is1")
    val r = TextOps.mannWhitneyOf(vals).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L)             // u2_en
    assert(r.getLong(3) == 10L)            // u2_other = 2*6 - 2
    assert(r.getLong(4) == 24L)            // tie term: t=3 at v=2
    // z = -4 * sqrt(60 / (6 * 96)) = -1.290994
    assert(r.getDouble(5) == -1.290994)
  }

  test("mannWhitneyOf: one-sided input yields NULL z, not a division error") {
    import spark.implicits._
    val r = TextOps.mannWhitneyOf(
      Seq((1L, true), (2L, true)).toDF("v", "is1")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(5))
  }

  test("kruskalOf: tie-exact doubled midrank sums and H on a hand fixture") {
    import spark.implicits._
    // a = {1, 2}, b = {2, 2}, c = {3}; sorted [1,2,2,2,3] midranks
    // (1, 3, 3, 3, 5): R_a = 4, R_b = 6, R_c = 5 (sum 15 = n(n+1)/2);
    // tie term 3^3-3 = 24; H = (0.4*51 - 18) / (1 - 24/120) = 3.0
    val vals = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 2L), ("c", 3L))
      .toDF("grp", "v")
    val rows = TextOps.kruskalOf(vals).collect()
    assert(rows.length == 3)
    val byGrp = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(byGrp("a") == ((2L, 8L)))   // 2*R_a
    assert(byGrp("b") == ((2L, 12L)))
    assert(byGrp("c") == ((1L, 10L)))
    rows.foreach { r =>
      assert(r.getLong(3) == 3L && r.getLong(4) == 5L && r.getLong(5) == 24L)
      assert(r.getDouble(6) == 3.0)
    }
  }

  test("kruskalOf: all-tied and single-group inputs yield NULL H, not a division error") {
    import spark.implicits._
    // all five values identical: tie correction factor is exactly zero
    val tied = TextOps.kruskalOf(
      Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L), ("b", 5L))
        .toDF("grp", "v")).collect()
    assert(tied.forall(_.isNullAt(6)))
    // one group: k < 2 guard
    val one = TextOps.kruskalOf(
      Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("grp", "v")).collect()
    assert(one.length == 1 && one(0).isNullAt(6))
  }

  test("sortedNeighborPairs: in-block window pairs confirmed, cross-block near-dup invisible") {
    import spark.implicits._
    val docs = Seq(
      // block "aaaaaaaaaaaa": three sorted neighbors; 1-2 and 2-3 are
      // close (1 edit), 1-3 within the w=3 window at distance 2
      (1L, "aaaaaaaaaaaa alpha beta gamma"),
      (2L, "aaaaaaaaaaaa alpha beta gamme"),
      (3L, "aaaaaaaaaaaa alpha beta gemme"),
      // same block, far text: candidates but over maxDist
      (4L, "aaaaaaaaaaaa something entirely different here"),
      // near-dup of doc 1 whose PREFIX differs -> different block,
      // never compared (the documented SNM blocking trade)
      (5L, "zaaaaaaaaaaa alpha beta gamma"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = DedupOps.sortedNeighborPairs(docs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L)))
  }

  test("sortedNeighborPairs: whitespace runs collapse before comparison") {
    import spark.implicits._
    val docs = Seq(
      (1L, "prefixprefix  hello   world"),
      (2L, "prefixprefix hello world")
    ).toDF("doc_id", "text")
    val got = DedupOps.sortedNeighborPairs(docs, 2, 0).collect()
    assert(got.length == 1 && got(0).getLong(2) == 0L)
  }

  test("concurrencyOf: sweep with half-open tie rule and cross-hour carry") {
    import spark.implicits._
    // three sessions in one hour: [0,100) [50,150) [100,200) — the
    // end at 100 sorts before the start at 100, so peak is 2, not 3
    val sess = Seq((0L, 100L), (50L, 150L), (100L, 200L)).toDF("s_us", "e_us")
    val r = TimeSeries.concurrencyOf(sess).collect()
    assert(r.length == 1 && r(0).getLong(1) == 6L && r(0).getLong(2) == 2L)
    // cross-hour carry: [0, 2h) spans hour 1 entirely; a short session
    // inside hour 1 must see it as carry-in
    val sess2 = Seq((0L, 7200000000L), (3600000005L, 3600000010L))
      .toDF("s_us", "e_us")
    val r2 = TimeSeries.concurrencyOf(sess2).collect()
    assert(r2.length == 1 && r2(0).getLong(2) == 2L)
  }

  test("ewmaOf: power-of-two weights, warm-up renormalization, gap zeros") {
    import spark.implicits._
    // counts (4, 0, 8) at w=2: weights (2, 1)
    val hc = Seq((0L, 4L), (2L, 8L)).toDF("hr", "y") // hr 1 is a spine zero
    val rows = TimeSeries.ewmaOf(hc, 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 4L, 4000000L),   // warm-up: only its own weight
        (1L, 0L, 1333333L),     // (0*2 + 4*1)/3
        (2L, 8L, 5333333L)))    // (8*2 + 0*1)/3
  }

  test("hitsKernel: hand-computed max-normalized fixed point on a bipartite fixture") {
    import spark.implicits._
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    val m = graft.queries.GraphOps.hitsKernel(edges, 2).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // iter1: auth s1=1e6 s2=5e5; hub c1=1e6 c2=666666
    // iter2: auth s1=1e6 s2=600000; hub c1=1e6 c2=625000
    assert(m("c1") == ((1000000L, 0L)))
    assert(m("c2") == ((625000L, 0L)))
    assert(m("s1") == ((0L, 1000000L)))
    assert(m("s2") == ((0L, 600000L)))
  }

  test("overlapOf: bin-credit counts each overlapping pair exactly once") {
    import spark.implicits._
    val H = 3600000000L
    val sess = Seq(
      (1L, 0L, 10 * H),      // u1: ten hours
      (2L, 5 * H, 6 * H),    // u2: inside u1's span -> one overlap, 1h
      (2L, 0L, 2 * H),       // u2 again: same bins 0,1 as u1 -> credit ONCE
      (3L, 20 * H, 21 * H)   // u3: no co-presence
    ).toDF("user_id", "s_us", "e_us")
    val got = TimeSeries.overlapOf(sess).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 3 * H)))
  }

  test("overlapOf: touching half-open intervals do not overlap") {
    import spark.implicits._
    val H = 3600000000L
    val sess = Seq((1L, 0L, 2 * H), (2L, 2 * H, 3 * H))
      .toDF("user_id", "s_us", "e_us")
    assert(TimeSeries.overlapOf(sess).collect().isEmpty)
  }

  test("readabilityOf: hand-computed Flesch-Kincaid with sign separation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // W=6 S=2 V=6 -> fk = -2.62
      (2L, null.asInstanceOf[String]),   // dropped
      (3L, "unpunctuated fragment")      // S floored at 1
    ).toDF("doc_id", "text")
    val got = TextOps.readabilityOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(got.head == ((1L, 6L, 2L, 6L, -2620000L)))
    // doc 3: W=2 S=1 V= vowel groups in "unpunctuated fragment":
    // u,u,ua,e,a,e = 6 -> fk = 0.39*2 + 11.8*3 - 15.59 = 20.59
    assert(got(1) == ((3L, 2L, 1L, 6L, 20590000L)))
  }

  test("abTestOf: hand-computed pooled z with exact rates; degenerate split yields NULL z") {
    import spark.implicits._
    // A (even): u0 converted, u2 not; B (odd): u1, u3 both converted
    val per = Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 1L))
      .toDF("user_id", "conv")
    val r = TimeSeries.abTestOf(per).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 2L)))
    assert(r.getLong(4) == 500000L && r.getLong(5) == 1000000L)
    // z = (1*2 - 2*2) * sqrt(4 / (2*2*3*1)) = -1.154701
    assert(r.getDouble(6) == -1.154701)
    // all-converted input: pooled variance is zero -> NULL z, no error
    val degenerate = Seq((0L, 1L), (1L, 1L)).toDF("user_id", "conv")
    assert(TimeSeries.abTestOf(degenerate).collect()(0).isNullAt(6))
  }

  test("heapsOf: hand-computed first sightings, cumulative points, and OLS moments") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = TextOps.heapsOf(docs).collect()(0)
    // points (cumT, cumV): (2,2) (4,3) (8,4); x/y = round(ln*1e3)
    val xs = Seq(2L, 4L, 8L).map(t => math.round(math.log(t.toDouble) * 1e3))
    val ys = Seq(2L, 3L, 4L).map(v => math.round(math.log(v.toDouble) * 1e3))
    val (n, sx, sy) = (3L, xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, sx, sy, sxx, sxy)))
    val beta = r.getDouble(5)
    val expBeta = BigDecimal((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(beta == expBeta)
    assert(beta > 0 && beta <= 1.0) // vocabulary grows sublinearly
  }

  test("q_burstiness/q_gap_stats: driver-side recompute from raw events agrees") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    graft.Tables.events(spark, sf).createOrReplaceTempView("ev_bs")
    // burstiness: recompute per-type (w, S, Q) over the global dense
    // hour spine in SQL and apply the same integer formula
    val hrs = spark.sql(
      """SELECT event_type, unix_timestamp(ts) div 3600 AS hr, count(*) AS y
        |FROM ev_bs GROUP BY 1, 2""".stripMargin).collect()
    val h0 = hrs.map(_.getLong(1)).min
    val h1 = hrs.map(_.getLong(1)).max
    val types = hrs.map(_.getString(0)).distinct.sorted
    val byTh = hrs.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = types.map { t =>
      val ys = (h0 to h1).map(h => byTh.getOrElse((t, h), 0L))
      val w = ys.length.toLong
      val sS = ys.sum
      val q = ys.map(y => y * y).sum
      t -> ((2 * (w * q - sS * sS) * 1000000L + w * sS) / (2 * w * sS))
    }.toMap
    val got = q("q_burstiness").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == expected)
    // gap stats: every percentile column must be an actual observed
    // gap and the ordering p50 <= p90 <= max, min <= mean must hold
    q("q_gap_stats").collect().foreach { r =>
      val (mn, p50, p90, mx, mean) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
      assert(mn <= mean && mean <= mx)
    }
  }

  test("q_embed_drift: dimension 0 agrees with a driver-side recompute") {
    val rows = q("q_embed_drift").collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding[0] AS DOUBLE) AS v")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def q6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val ref = emb.filter(_._1 % 2 == 0).map(x => q6(x._2))
    val cur = emb.filter(_._1 % 2 != 0).map(x => q6(x._2))
    val num = ref.sum * cur.length - cur.sum * ref.length
    val den = ref.length.toLong * cur.length
    val expect = (if (num < 0) -1L else 1L) *
      ((2 * math.abs(num) + den) / (2 * den))
    val d0 = rows.find(_.getLong(0) == 0L).get
    assert((d0.getLong(1), d0.getLong(2)) == ((ref.length.toLong, cur.length.toLong)))
    assert(d0.getLong(5) == expect)
    // every embedding element is accounted for in exactly one side
    val width = rows.length
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum ==
      width.toLong * (ref.length + cur.length))
  }

  test("q_winsorize: clamp bounds are observed values and order mean sanity holds") {
    val rows = q("q_winsorize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p10, p90, mean, wmean) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p10 <= p90)
      // the winsorized mean lives inside the clamp bounds by construction
      assert(p10 <= wmean && wmean <= p90)
      // a 10% winsorization cannot move the mean past the bounds either
      assert(mean >= p10 - math.abs(mean) && mean <= p90 + math.abs(mean))
    }
    // driver-side recompute for one event type
    val t = rows.head.getString(0)
    val vals = graft.Tables.events(spark, sf)
      .filter(col("event_type") === t && col("value").isNotNull)
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    def cut(p: Int): Long = vals(((n * p + 99) / 100 - 1).toInt max 0)
    val p10 = cut(10); val p90 = cut(90)
    val sW = vals.map(c => math.max(math.min(c, p90), p10)).sum
    val expW =
      if (sW >= 0) (2 * sW + n) / (2 * n) else -((2 * math.abs(sW) + n) / (2 * n))
    val r0 = rows.head
    assert((r0.getLong(2), r0.getLong(3)) == ((p10, p90)))
    assert(r0.getLong(5) == expW)
  }

  test("cusumOf: hand-computed max-prefix statistic, both one-sided detectors") {
    import spark.implicits._
    // y = (1,1,5,5): d = 4y-12 = (-8,-8,8,8); P = (-8,-16,-8,0)
    val hc = Seq((0L, 1L), (1L, 1L), (2L, 5L), (3L, 5L)).toDF("hr", "y")
    val rows = TimeSeries.cusumOf(hc).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      (0L, 0L, false, false),
      (0L, 8L, false, false),
      (8L, 0L, false, false),
      (16L, 0L, false, false))) // 16^2 = 256 < 25*(4*52-144) = 1600
  }

  test("mkTrendOf: strictly increasing series gives S = n(n-1)/2 and the corrected z") {
    import spark.implicits._
    val dc = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("day", "y")
    val r = TimeSeries.mkTrendOf(dc).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 66L)))
    // z = (3-1) * sqrt(18/66) = 1.044466
    assert(r.getDouble(3) == 1.044466)
    // all-equal series: S = 0, var18 = 0 after full tie correction -> NULL
    val flat = Seq((10L, 2L), (11L, 2L), (12L, 2L)).toDF("day", "y")
    val rf = TimeSeries.mkTrendOf(flat).collect()(0)
    assert(rf.getLong(1) == 0L && rf.isNullAt(3))
  }

  test("q_benford: dense digit spine, counts conserve, shares sum to ~1e6") {
    val rows = q("q_benford").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val nPos = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .filter(col("c") > 0).count()
    assert(rows.map(_.getLong(1)).sum == nPos)
    val shareSum = rows.map(_.getLong(2)).sum
    assert(math.abs(shareSum - 1000000L) <= 9) // rounding slack per digit
  }

  test("q_survival: KM curve is monotone nonincreasing, starts <= 1e6, ends at 0") {
    val rows = q("q_survival").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.reverse.toSeq)
    assert(rows.head._4 <= 1000000L)
    assert(rows.last._4 == 0L) // everyone is uncensored: S hits 0
    // at-risk counts telescope: n_risk(t_i+1) = n_risk(t_i) - d(t_i)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._2 - a._3)
    }
    // n_risk at the first lifetime is the full user population
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.head._2 == nUsers)
  }

  test("q_ltv: ages are dense per cohort and revenue conserves") {
    val rows = q("q_ltv").collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val ages = rs.map(_.getLong(1)).sorted
      assert(ages.toSeq == (0L to ages.max)) // dense spine
    }
    val totalRev = rows.map(_.getLong(3)).sum
    val expect = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(totalRev == expect)
    // cumulative telescopes within each cohort
    byCohort.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b.getLong(4) == a.getLong(4) + b.getLong(3))
      }
    }
  }

  test("q_decompose: exact additive identity on interior rows, NULL edges") {
    val rows = q("q_decompose").collect()
    assert(rows.length >= 25)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        // y*1e6 == trend + seasonal + resid EXACTLY (integer identity)
        assert(r.getLong(1) * 1000000L ==
          r.getLong(2) + r.getLong(3) + r.getLong(4))
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
    // exactly 12 partial-window rows at each edge
    assert(rows.count(_.isNullAt(2)) == 24)
  }

  test("q_embed_outliers: heap top-k equals a full-sort reference and d2 is exact") {
    val rows = q("q_embed_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20 && rows.map(_._3).toSeq == (1L to 20L))
    // full-sort reference: recompute every d2 driver-side
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def q6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val dims = emb.head._2.length
    val cen = (0 until dims).map { i =>
      val xs = emb.map(e => q6(e._2(i)))
      val sx = xs.sum; val n = xs.length.toLong
      if (sx >= 0) (2 * sx + n) / (2 * n) else -((2 * math.abs(sx) + n) / (2 * n))
    }
    val d2s = emb.map { case (id, v) =>
      (id, (0 until dims).map(i => { val d = q6(v(i)) - cen(i); d * d }).sum)
    }
    val ref = d2s.sortBy { case (id, d2) => (-d2, id) }.take(20)
    assert(rows.map(r => (r._1, r._2)).toSeq == ref.toSeq)
  }

  test("q_trend/q_acf on testdata: moments agree with an independent SQL recount") {
    val r = q("q_trend").collect()(0)
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("ev_st")
    val chk = spark.sql(
      """SELECT count(*) AS n, sum(y) AS sy FROM (
        |  SELECT d, count(*) AS y FROM
        |    (SELECT unix_timestamp(ts) div 86400 AS d FROM ev_st)
        |  GROUP BY d)""".stripMargin).collect()(0)
    // observed days <= spine days; total events conserve in sy
    assert(r.getLong(0) >= chk.getLong(0))
    assert(r.getLong(2) == chk.getLong(1))
    val acf = q("q_acf").collect()
    assert(acf.length == 6)
    // autocorrelation is a correlation: |acf_fp| <= 1e6
    assert(acf.forall(a => Math.abs(a.getLong(4)) <= 1000000L))
  }

  test("q_forecast equals a driver-side seasonal-naive recompute on the dense spine") {
    val rows = q("q_forecast").collect()
    assert(rows.nonEmpty)
    val hc = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("hr"))
      .groupBy("event_type", "hr").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h0 = hc.keys.map(_._2).min
    val h1 = hc.keys.map(_._2).max
    rows.foreach { r =>
      val t = r.getString(0)
      val y = (h0 to h1).map(h => hc.getOrElse((t, h), 0L))
      val span = y.length
      val test = (span - 48) until span
      val eSum = test.map(i => math.abs(y(i) - y(i - 24))).sum
      val dSum = (1 until span - 48).map(i => math.abs(y(i) - y(i - 1))).sum
      assert(r.getAs[Long]("n_test") == 48L)
      assert(r.getAs[Long]("n_train") == (span - 49).toLong)
      assert(r.getAs[Long]("e_sum") == eSum)
      assert(r.getAs[Long]("d_sum") == dSum)
      if (dSum > 0) {
        val expected = (BigInt(2) * eSum * (span - 49) * 1000000 +
          BigInt(48) * dSum) / (BigInt(2) * 48 * dSum)
        assert(r.getAs[Long]("mase_fp") == expected.toLong, s"mase for $t")
      }
    }
  }

  test("q_spearman equals a driver-side centered-average-rank recompute") {
    val rows = q("q_spearman").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"),
        expr("(unix_timestamp(ts) div 3600) % 24").as("hod"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def centeredRanks(xs: Seq[Long]): Seq[Long] = {
      val n = xs.length
      // 2·avg-rank per value: 2·minRank + ties − 1, centered by n+1
      val sorted = xs.sorted
      val minRank = sorted.zipWithIndex.reverse.toMap.map {
        case (v, _) => v -> (sorted.indexOf(v) + 1) }
      val ties = xs.groupBy(identity).view.mapValues(_.length).toMap
      xs.map(x => 2L * minRank(x) + ties(x) - 1 - (n + 1))
    }
    rows.foreach { r =>
      val t = r.getString(0)
      val grp = ev.filter(_._1 == t)
      val xa = centeredRanks(grp.map(_._2))
      val xb = centeredRanks(grp.map(_._3))
      assert(r.getAs[Long]("n") == grp.length.toLong)
      assert(xa.sum == 0L && xb.sum == 0L, "centered ranks sum to zero")
      assert(r.getAs[Long]("sxy") == xa.zip(xb).map { case (a, b) => a * b }.sum)
      assert(r.getAs[Long]("sxx") == xa.map(a => a * a).sum)
      assert(r.getAs[Long]("syy") == xb.map(b => b * b).sum)
      val rho = r.getAs[java.lang.Double]("rho")
      if (rho != null) assert(math.abs(rho) <= 1.0)
    }
  }

  test("q_welch: moments replay driver-side; planted two-group fixture matches hand math") {
    import spark.implicits._
    // corpus run: moments reconcile and t/df replay through the same
    // double op sequence
    val r = SparkEntry.queries("q_welch")(spark, TestSpark.sf).collect().head
    val (n1, n2) = (r.getAs[Long]("n_1"), r.getAs[Long]("n_2"))
    val (s1, s2) = (r.getAs[Long]("sum_1"), r.getAs[Long]("sum_2"))
    val (q1, q2) = (r.getAs[Long]("sumsq_1"), r.getAs[Long]("sumsq_2"))
    assert(n1 > 0 && n2 > 0)
    val v1 = (q1.toDouble - s1.toDouble * s1 / n1) / (n1 - 1) / n1
    val v2 = (q2.toDouble - s2.toDouble * s2 / n2) / (n2 - 1) / n2
    // Spark's round(double, 6) = BigDecimal.valueOf + HALF_UP
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val t = round6((s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(v1 + v2))
    val df = round6((v1 + v2) * (v1 + v2) / (v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1)))
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-9)
    assert(math.abs(r.getAs[Double]("df") - df) < 1e-9)
    assert(r.getAs[Double]("df") >= math.min(n1, n2) - 1.0) // Welch df lower bound
    // planted fixture: en = {10,12,14}, rest = {30,34} — hand-checked
    // means 12 vs 32, variances 4 vs 8
    val tmp = java.nio.file.Files.createTempDirectory("welch").toString
    Seq((1L, "en", 10L), (2L, "en", 12L), (3L, "en", 14L),
      (4L, "fr", 30L), (5L, "de", 34L))
      .map { case (i, l, n) => (i, "x", l, "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val f = graft.queries.TextOps.q_welch(spark, tmp).collect().head
    // se^2 = 4/3 + 8/2 = 16/3; t = -20/sqrt(16/3)
    val tExp = java.math.BigDecimal.valueOf(-20.0 / math.sqrt(16.0 / 3))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(f.getAs[Double]("t") == tExp)
    // degenerate: one group under 2 rows -> NULL in both stats
    Seq((1L, "en", 10L), (4L, "fr", 30L), (5L, "de", 34L))
      .map { case (i, l, n) => (i, "x", l, "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val g = graft.queries.TextOps.q_welch(spark, tmp).collect().head
    assert(g.isNullAt(g.fieldIndex("t")) && g.isNullAt(g.fieldIndex("df")))
  }
}
