package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators (SURVEY.md §2.4 approx family, extended):
  * the 100 TB distinct-counting shape is NOT one global pass — it is
  * per-partition/per-group partial sketches, shuffled as kilobyte
  * binaries and unioned, so a distinct-count over any rollup level
  * reuses the same partials. Spark 4 ships Apache DataSketches HLL
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — no
  * custom code needed, exactly the built-in-first preference.
  *
  * Sketch binaries are engine-specific, so the verified surface is
  * bound-check booleans the Spark side computes from the estimates
  * (round 11 — every key in this file now sits under the DuckDB hash
  * oracle); the unit tests additionally pin the raw estimates.
  */
object SketchOps {

  /** Per-nation customer sketches unioned to a global estimate in one
    * extra (tiny) aggregation over sketch binaries — the partial-merge
    * pattern. The sketch estimates are engine-specific, so the verified
    * output is the BAND-CHECK form (round-11, closing the
    * no_oracle row): per-level exact counts, a boolean asserting each
    * level's estimate landed within ±5% of exact, and — on the global
    * (-1) row — `merge_tracks_rebuild`: the estimate from UNIONING the
    * 25 per-nation partials lands within 2% of the estimate from one
    * single-pass sketch over the whole table. NOT exact equality:
    * register-wise max IS associative, but DataSketches switches from
    * the HIP estimator (single-stream) to the composite estimator
    * after any union, so merged and rebuilt ESTIMATES legitimately
    * differ (measured 0 / 0.40% / 0.19% at the three sfs; a dropped
    * partial shifts the union ≥4%, well outside the band — the
    * property that makes the sketch usable as partials at 100 TB
    * stays falsifiable). Per-nation rows carry
    * `merge_tracks_rebuild = true` by definition (they ARE built
    * directly). AggregatorSpec pins the raw estimates at sf0.001.
    */
  def q_sketch_merge(s: SparkSession, d: String): DataFrame = {
    val perNation = customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        hll_sketch_agg(col("c_custkey")).as("sk"),
        countDistinct(col("c_custkey")).as("exact_distinct"))
    // the rebuild scan exists only for the band check — production
    // keeps the partials and never rescans the fact table
    val rebuilt = customer(s, d)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("rb"))
    // the union aggregates 25 kilobyte-sized binaries — the "reduce"
    // over partials
    val global = perNation.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      sum(col("exact_distinct")).as("exact_distinct"))
      .crossJoin(broadcast(rebuilt))
      .select(lit(-1L).as("c_nationkey"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct")) * 100 <=
          col("exact_distinct") * 5).as("est_within_5pct"),
        (abs(col("est") - col("rb")) * 100 <= col("rb") * 2)
          .as("merge_tracks_rebuild"))
    perNation
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("exact_distinct"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_distinct")) * 100 <=
          col("exact_distinct") * 5).as("est_within_5pct"),
        lit(true).as("merge_tracks_rebuild"))
      .unionAll(global)
      .orderBy("c_nationkey")
  }

  /** K-Minimum-Values distinct sketch (KmvAggregator) under the FULL
    * hash-match oracle — the deterministic counterpart to
    * [[q_sketch_merge]]'s HLL: per-nation bounded-state sketches built
    * in one pass, then a union level that merges the finished sketch
    * ARRAYS (KmvMergeAggregator) into the global (-1) row without
    * rescanning customer. Hash = the engine-portable 60-bit md5 window
    * (the minhash bridge); estimate = (k-1)·2^60 / kth_min once the
    * sketch saturates, exact n_kept below that. DuckDB reproduces the
    * identical minima with a rank window, so build, merge, AND
    * estimate are hash-verified — no rows-only concession.
    */
  /** Misra–Gries heavy hitters over the corpus CHARACTER stream — the
    * bounded-state top-frequency sketch ([[graft.functions
    * .MisraGriesAggregator]]): 16 counters against 25 distinct symbols
    * force real evictions, and the 6 symbols above the N/17 frequency
    * threshold are provably retained. The verified surface is the
    * deterministic GUARANTEE, not the estimates: MG counts depend on
    * partition order, but `true − ⌊N/(k+1)⌋ ≤ ĉ ≤ true` and
    * "true > N/(k+1) ⇒ present" hold under ANY partitioning (the
    * mergeable-summaries theorem), so the booleans hash-match a DuckDB
    * oracle that computes the exact side and literal TRUEs — the
    * q_agg_approx band-check stance, and falsifiable the same way: a
    * wrong merge (e.g. dropping a partial, or truncating without the
    * rank-(k+1) subtraction) breaks `within_band` on the first skewed
    * input.
    *
    * Two scans by design: the SKETCH pass is the product a real
    * pipeline runs (O(k) state, kilobyte partials); the exact
    * count pass exists to band-check it, the q_sim_recall
    * exact-branch pattern.
    */
  def q_heavyhitters(s: SparkSession, d: String, k: Int = 16): DataFrame = {
    val chars = documents(s, d).filter(col("text").isNotNull)
      .select(explode(split(col("text"), "")).as("c"))
      .filter(length(col("c")) > 0)
    val exact = chars.groupBy("c").agg(count(lit(1)).as("n_exact"))
      .transform(graft.plans.Ckpt.maybe) // read twice: total + output rows
    val tot = exact.agg(sum(col("n_exact")).as("n_total"))
    val sketch = chars.agg(
      graft.functions.MisraGriesAggregator.mg(k)(col("c")).as("sk"))
    exact.crossJoin(broadcast(tot))
      .filter(col("n_exact") * (k + 1) > col("n_total"))
      .crossJoin(broadcast(sketch))
      .select(col("c"), col("n_exact"), col("n_total"),
        expr("(2 * n_exact * 1000000 + n_total) div (2 * n_total)")
          .as("share_fp"),
        element_at(col("sk"), col("c")).isNotNull.as("in_sketch"),
        // integer floor band: `div`, NOT `/` (Spark's / is double);
        // coalesce so a retention violation (missing key → NULL
        // element_at) reads as a genuine FALSE, not NULL
        coalesce(
          element_at(col("sk"), col("c")) <= col("n_exact") &&
            element_at(col("sk"), col("c")) >=
              col("n_exact") - expr(s"n_total div ${k + 1}"),
          lit(false))
          .as("within_band"))
      .orderBy("c")
  }

  def q_sketch_kmv(s: SparkSession, d: String): DataFrame = {
    val k = 32
    val hashed = customer(s, d).select(
      col("c_nationkey"),
      graft.functions.HashFunctions.md5WindowU(
        concat(lit("kmv:"), col("c_custkey")), 1, 15).as("hv"))
    val perNation = hashed.groupBy("c_nationkey")
      .agg(graft.functions.KmvAggregator.kmv(k)(col("hv")).as("sk"))
    val global = perNation
      .agg(graft.functions.KmvAggregator.kmvMerge(k)(col("sk")).as("sk"))
      .select(lit(-1L).as("c_nationkey"), col("sk"))
    val twoTo60 = 1152921504606846976.0 // 2^60, exact in a double
    perNation
      .select(col("c_nationkey").cast("long").as("c_nationkey"), col("sk"))
      .unionAll(global)
      .select(
        col("c_nationkey"),
        size(col("sk")).cast("long").as("n_kept"),
        // the size guards keep element_at off the empty-input global
        // row (ANSI would fault on index 0)
        when(size(col("sk")) > 0, element_at(col("sk"), size(col("sk"))))
          .as("kth_min"),
        when(size(col("sk")) < k, size(col("sk")).cast("double"))
          .otherwise(round(
            lit((k - 1) * twoTo60) / element_at(col("sk"), lit(k)).cast("double"), 4))
          .as("approx_distinct"))
      .orderBy("c_nationkey")
  }

  /** Approximate percentiles from an equi-width histogram sketch —
    * the mergeable quantile structure: 64 bin COUNTS are the entire
    * distributed state (they merge by addition across partitions,
    * partitions of partitions, or days of a rolling window), and the
    * estimate interpolates linearly inside the target bin. Exact
    * `percentile_cont` (q_percentile) needs a full sort or large
    * sketch; at 100 TB the histogram path aggregates to 64 longs and
    * its map-side partials never exceed that. Deterministic end to
    * end — bins, cumulative sums, and interpolation are integer/double
    * arithmetic — so unlike t-digest/KLL the whole estimate sits
    * under the hash-match oracle.
    */
  def q_approx_pct(s: SparkSession, d: String): DataFrame = {
    val bins = 64
    val width = 110000.0 / bins // 1718.75, exact in a double
    val price = col("l_extendedprice").cast("double")
    val hist = lineitem(s, d)
      .select(least(floor(price / width), lit(bins - 1)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("cum", sum("n").over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("n").over(
        Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val ps = s.createDataFrame(Seq(Tuple1(0.5), Tuple1(0.95), Tuple1(0.99))).toDF("p")
    cum.crossJoin(broadcast(ps))
      .filter(col("cum") >= col("p") * col("total") &&
        col("cum") - col("n") < col("p") * col("total"))
      .select(col("p"),
        round(col("bin") * width +
          lit(width) * (col("p") * col("total") - (col("cum") - col("n"))) / col("n"), 4)
          .as("approx_value"))
      .orderBy("p")
  }

  /** Exact twin of [[q_sketch_merge]]'s verified surface: per-nation
    * distinct counts plus the (-1) all-nations row, same shape minus
    * the sketch estimate. This keys the hash-verifiable half of the
    * sketch query to the DuckDB oracle, so the only unverified columns
    * left in the family are the genuinely engine-specific estimates.
    * The global row reuses the partial-merge idea: custkeys are
    * per-nation disjoint, so the union level is a sum over the 25
    * per-nation partials, never a rescan.
    */
  def q_sketch_exact(s: SparkSession, d: String): DataFrame = {
    val perNation = customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("c_custkey")).as("exact_distinct"))
    val global = perNation
      .agg(sum(col("exact_distinct")).as("exact_distinct"))
      .select(lit(-1L).as("c_nationkey"), col("exact_distinct"))
    perNation
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("exact_distinct"))
      .unionAll(global)
      .orderBy("c_nationkey")
  }

  /** Count-Min Sketch heavy-hitter estimates over corpus trigrams —
    * the mergeable frequency sketch a 100 TB pipeline uses where an
    * exact n-gram table is unaffordable. The sketch build is the
    * scale path: `groupBy(lane, bucket)` over the exploded gram
    * stream has AT MOST depth×width distinct keys, so hash partial
    * aggregation collapses every partition to ≤ d·w counters
    * map-side and the shuffle moves kilobytes regardless of corpus
    * size — the CMS update rule expressed as a bounded-key
    * aggregation instead of a custom UDAF (built-in-first: Catalyst
    * codegens the whole update path). Lane hashes are the repo's
    * engine-portable 60-bit md5 window, so the sketch is
    * deterministic and the DuckDB oracle reproduces every counter
    * bit-for-bit — build, point query, AND error are hash-verified,
    * unlike the engine-specific HLL binaries in [[q_sketch_merge]].
    *
    * The exact top-k candidate branch is a second pass (one
    * map-side-combined gram count, Zipf-bounded output, TakeOrdered
    * top-k) — the oracle/diagnostic twin, same two-pass stance as
    * q_tfidf: at true scale you'd keep only the sketch and feed
    * candidates from a heavy-hitter stream. The estimate join probes
    * the ≤ d·w-row sketch broadcast against k×d candidate lanes;
    * output pins est ≥ exact (CMS one-sided error) with the
    * overestimate surfaced as cms_err.
    */
  /** Adjacent space-delimited trigrams of a non-null `text` column —
    * let-bound word array (the round-7 HOF rule). Shared by the batch
    * sketch and [[graft.streaming.StreamingOps.streamingCms]].
    */
  private[graft] def trigramRows(docs: DataFrame): DataFrame = docs
    .filter(col("text").isNotNull)
    .withColumn("w", expr("filter(split(text, ' '), x -> x <> '')"))
    .select(explode(expr(
      """transform(slice(w, 1, greatest(size(w) - 2, 0)),
        |  (x, i) -> concat_ws(' ', x, element_at(w, i + 2), element_at(w, i + 3)))"""
        .stripMargin)).as("gram"))

  /** The d lane/bucket pairs of a `gram` column. Digest reuse (the
    * minhash stance — DedupOps.signatures): one md5 yields TWO 60-bit
    * hex windows (chars 1-15 and 17-31), so lanes 2j/2j+1 share the
    * seeded digest `"j:gram"` and the per-gram hashing cost is
    * depth/2 digests, not depth. Measured NEUTRAL at sf0.1 (TimeOne
    * warm ~1.8-2.1s both ways — the pass is explode/agg-bound at this
    * gram length); kept because digest cost scales with gram bytes
    * while the agg does not, and the md5-count discipline matches the
    * minhash family's A/B-measured stance. Windows of one md5 are
    * independent enough
    * for CMS's pairwise-hash requirement (same argument the minhash
    * family documents); the estimate-quality invariants in CmsSpec
    * hold unchanged.
    */
  private[graft] def cmsLanes(depth: Int, width: Int) =
    array((0 until depth).map { j =>
      val h = md5(concat(lit(s"${j / 2}:"), col("gram")))
      val off = if (j % 2 == 0) 1 else 17
      struct(lit(j.toLong).as("lane"),
        pmod(graft.functions.HashFunctions.hexWindowU(h, off, 15),
          lit(width.toLong)).as("bucket"))
    }: _*)

  def q_ngram_cms(s: SparkSession, d: String, depth: Int = 4,
                  width: Int = 1024, topK: Int = 20): DataFrame = {
    val grams = trigramRows(documents(s, d))
    val lanes = cmsLanes(depth, width)
    // sketch: one pass over the gram stream, bounded-key aggregation
    val sketch = grams
      .select(explode(lanes).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("counter"))
    // exact candidates: Zipf-bounded count + TakeOrdered top-k
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("gram")).limit(topK)
    // probe: k×d candidate lanes against the broadcast ≤ d·w sketch
    val probes = exact.select(col("gram"), col("cnt"), explode(lanes).as("lb"))
      .select(col("gram"), col("cnt"),
        col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
    val est = probes.join(broadcast(sketch), Seq("lane", "bucket"))
      .groupBy("gram").agg(first(col("cnt")).as("cnt"),
        min(col("counter")).as("cms_est"))
    est.select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("cnt"), col("gram"))).cast("long").as("rank"),
        col("gram"), col("cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("cms_err"))
      .orderBy("rank")
  }
}
