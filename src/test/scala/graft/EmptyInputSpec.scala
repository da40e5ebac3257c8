package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run (not crash) over 0-row inputs —
  * empty partitions and empty tables are routine at scale, and plans
  * with windows/aggregates/generators all have empty-input edge paths.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    val tmp = Files.createTempDirectory("empty-sf").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // limit(0) through the real readers keeps the exact column types
      // (events goes through the nanos shim → plain bigint ts on disk,
      // which the shim reads back unchanged).
      val src =
        if (t == "events")
          spark.read.parquet(s"$sf/$t.parquet") // raw: preserves ts as long via conf set by Tables.events earlier
        else Tables.table(spark, sf, t)
      src.limit(0).write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  // global aggregates (no GROUP BY) correctly emit one row over empty
  // input: count=0, sum=null — standard SQL semantics
  // (q_sketch_merge's union row is a global aggregate too)
  private val globalAggs =
    Set("q_agg_count", "q_agg_distinct", "q_agg_approx", "q_sketch_merge",
      "q_sketch_exact", "q_sketch_kmv", "q_zipf", "q_ks",
      // round-9 one-row reports: OLS moments, rank-sum, pooled A/B —
      // all emit their single aggregate row (counts 0, NULL stats)
      "q_trend", "q_mannwhitney", "q_ab_test", "q_heaps", "q_mk_trend",
      // round-14: Welch moments are the same one-aggregate-row shape;
      // cdc savings always emits its '(all)' global rollup row
      "q_welch", "q_cdc_savings")

  // the ablation report is a global aggregate exploded to one row per
  // RULE: an empty corpus yields its 4 rule rows (n_docs=0, null
  // sums), mirroring DuckDB's one-aggregate-row-per-rule UNION
  private val fixedRowReports =
    Map("q_quality_ablation" -> 4L, "q_profile" -> 5L,
      // the seasonality spine is the full 7x24 calendar even over an
      // empty corpus (0 counts, NULL lift — the dashboard contract)
      "q_seasonality" -> 168L,
      // the Benford digit spine is always its 9 rows (0 counts)
      "q_benford" -> 9L,
      // the threshold-sweep spine is its 5 literal cutoffs (0 counts)
      "q_dedup_savings" -> 5L,
      // the vocab-sweep spine is its 5 merge checkpoints (null sums)
      "q_bpe_sweep" -> 5L,
      // the dimension-sweep spine is its 4 prefix lengths (one global
      // aggregate row per m: hits=0, total=0, NULL recall)
      "q_dim_recall" -> 4L)

  test("all declared queries run on empty tables with the expected cardinality") {
    // ensure the nanosAsLong conf is set before reading raw events
    Tables.events(spark, sf).count()
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, emptyDir).count()
      val expected =
        if (globalAggs(name)) 1L else fixedRowReports.getOrElse(name, 0L)
      assert(n == expected, s"$name returned $n rows on empty input (expected $expected)")
    }
  }
}
