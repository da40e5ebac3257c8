package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit tool's check as a test, so a cartesian-product
  * regression in ANY declared query fails `sbt test`, not just the
  * manually-run tool. Planning only — no query executes.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no declared query plans a CartesianProduct (auto-broadcast disabled)") {
    // with auto-broadcast off, only explicit broadcast() hints
    // broadcast — the plan shape production-size inputs would get
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val audit = graft.tools.PlanAudit.auditPlans(spark, sf)
      assert(audit.cartesian.isEmpty,
        s"cartesian products in: ${audit.cartesian.mkString(", ")}")
      // round-11 rule: no single-partition WindowExec over unbounded
      // input anywhere in the 235-key inventory (the q_rfm /
      // q_ccnet_split / q_lorenz class — fixed via GlobalRank).
      // Bounded spines are allowlisted BY KEY with their reason in
      // PlanAudit.globalWindowAllowlist; anything new must either
      // rank via GlobalRank or argue its boundedness there.
      assert(audit.globalWindows.isEmpty,
        s"unpartitioned WindowExec over unbounded input in: ${audit.globalWindows.mkString(", ")}")
      // pin: every CodegenFallback class in the inventory today is a
      // KNOWN, deliberate interpreted family — higher-order-function
      // lambdas (per-row array ops, documented at their call sites),
      // typed Aggregators (TopK/KMV/BoundedCollect run imperative under
      // ObjectHashAggregate by design), and imperative-buffer builtins
      // (percentile/pivot/collect/HLL). A class OUTSIDE this allowlist
      // appearing anywhere needs a conscious decision — that is the
      // round-4 q_sim_ivf lesson (a fallback scalar in a hot
      // projection silently evicts whole-stage codegen).
      val allowed = Set(
        "ArrayTransform", "ArrayFilter", "ArraySort", "ArrayAggregate",
        "ZipWith", // q_sim_ivfpq residual: once per row, linear in dim
        "LambdaFunction", "NamedLambdaVariable",
        "ScalaAggregator",
        "Percentile", "PivotFirst", "CollectSet", "CollectList",
        "HyperLogLogPlusPlus", "HllSketchAgg", "HllUnionAgg", "HllSketchEstimate")
      val novel = audit.fallbacks
        .map { case (q, fb) => q -> (fb -- allowed) }.filter(_._2.nonEmpty)
      assert(novel.isEmpty, s"NEW CodegenFallback classes (not allowlisted): $novel")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q_entropy/q_text_normalize stay on their codegen'd kernel expressions") {
    // round 9: q_entropy's 3.4s -> 0.76s hangs on char_entropy_fp
    // replacing the interpreted aggregate() HOF; a refactor that
    // reintroduces the fold (or a UDF) would silently pay the
    // per-character lambda again. Planning only.
    def exprClasses(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten
        .flatMap(_.collect { case e => e.getClass.getSimpleName }).toSet
    val ent = exprClasses(graft.queries.TextOps.q_entropy(spark, sf))
    assert(ent.contains("CharEntropyFp"), s"kernel missing: $ent")
    assert(!ent.contains("ArrayAggregate"),
      "interpreted aggregate() HOF reappeared in q_entropy")
    assert(!ent.contains("ArrayFilter"),
      "interpreted filter() HOF reappeared in q_entropy")
    val norm = exprClasses(graft.queries.TextOps.q_text_normalize(spark, sf))
    assert(norm.contains("UnicodeNormalize"), s"kernel missing: $norm")
  }

  test("iteration kernels keep their broadcast hints (rank/frontier joins stay BroadcastHashJoin)") {
    // r8 verdict #7: q_pagerank's 17.7s -> 3.5s fix hangs on one-line
    // broadcast() hints that a refactor could silently drop,
    // reintroducing K full edge exchanges. The kernels execute eagerly
    // (localCheckpoint per iteration/level), so the rank/frontier
    // joins are NOT in the returned DataFrame's plan — capture every
    // executed plan via a QueryExecutionListener instead and count
    // BroadcastHashJoin across them. Auto-broadcast is disabled, so
    // only the explicit hints can produce one: a dropped hint turns
    // its join into SortMergeJoin and the count below the minimum.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    import scala.jdk.CollectionConverters._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def broadcastJoins: Int =
      plans.asScala.map("BroadcastHashJoin".r.findAllIn(_).size).sum
    // the listener bus is asynchronous (and can lag seconds behind a
    // kernel that fires many checkpoint actions) — poll until the
    // expected count arrives or a 20s timeout expires, then assert on
    // whatever was delivered
    def awaitBroadcastJoins(min: Int): Int = {
      var waited = 0
      while (broadcastJoins < min && waited < 80) {
        Thread.sleep(250); waited += 1
      }
      broadcastJoins
    }
    def runAndAssert(name: String, minJoins: Int): Unit = {
      plans.clear()
      // collect(), NOT count(): under count() the optimizer prunes
      // every output column, and the kernels' left-outer joins against
      // per-key aggregates are then provably cardinality-preserving —
      // Catalyst deletes the whole iteration chain and the broadcast
      // joins with it (observed: q_pagerank_seed's count() plan
      // contains zero iteration joins). collect() keeps the rank/hop
      // columns referenced, so the kernel stays in the executed plan.
      SparkEntry.queries(name)(spark, sf).collect()
      val n = awaitBroadcastJoins(minJoins)
      assert(n >= minJoins,
        s"$name: expected >= $minJoins BroadcastHashJoin in its executed " +
          s"plans (one per iteration/level), saw $n — a broadcast hint " +
          "was dropped and the kernel degraded to shuffle joins")
    }
    try {
      // fresh-build discipline: an earlier suite may have memoized the
      // shared graph artifacts (e.g. PageRankSpec's q_graph_modularity
      // builds the r15 shared LPA label table) — a cache hit here
      // would capture only the finish joins, not the iteration kernel
      graft.queries.GraphOps.SharedGraph.reset()
      runAndAssert("q_pagerank", 3)      // broadcast(ranks) x 3 iterations
      runAndAssert("q_pagerank_dir", 3)  // broadcast(ranks) x 3 iterations
      runAndAssert("q_pagerank_seed", 3) // broadcast(ranks) x 3 iterations
      runAndAssert("q_graph_hops", 4)    // broadcast(frontier) x 4 levels
      runAndAssert("q_graph_lpa", 3)     // broadcast(labels) x 3 iterations
      // the co-partitioned variant must do the OPPOSITE: rank joins
      // plan ShuffledHashJoin (one per iteration), never broadcast —
      // the hint degrading to SMJ would silently re-sort the
      // checkpointed edge partitions every iteration
      def shj: Int = plans.asScala.map("ShuffledHashJoin".r.findAllIn(_).size).sum
      def runCopart(name: String, min: Int): Unit = {
        plans.clear()
        SparkEntry.queries(name)(spark, sf).collect()
        var waited = 0
        while (shj < min && waited < 80) { Thread.sleep(250); waited += 1 }
        assert(shj >= min,
          s"$name: expected >= $min ShuffledHashJoin iteration joins, saw $shj")
      }
      runCopart("q_pagerank_copart", 3)   // rank join x 3 iterations
      runCopart("q_graph_hops_copart", 4) // frontier join x 4 levels
      // round-9 keys whose scale story hangs on model-sized broadcast
      // dims: degree tables (jaccard/adamic), cohort/size tables
      // (retention), median/MAD tables (outliers). These two count
      // the orientation join inside the triangle enumeration, which
      // since round 13 builds ONCE per (app, dir) in SharedGraph —
      // reset the cache before each so the assert pins the fresh
      // build shape, not whichever suite ran a graph key first
      graft.queries.GraphOps.SharedGraph.reset()
      runAndAssert("q_graph_jaccard", 3)  // deg dim in orientation + 2 output joins
      graft.queries.GraphOps.SharedGraph.reset()
      runAndAssert("q_graph_adamic", 3)   // deg dim in orientation + center-degree join
      runAndAssert("q_retention", 2)      // cohort + cohort-size joins
      runAndAssert("q_outliers", 5)       // med x3 + mad x2 attach joins
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("fallback scanner detects a known CodegenFallback through a shuffled plan") {
    import org.apache.spark.sql.functions._
    // self-check with an expression that is still CodegenFallback in
    // Spark 4.1 (`reflect`; the round-4 offender array_max-over-structs
    // gained codegen since, which is why the inventory pins empty).
    // The probe includes a groupBy so the plan carries an exchange —
    // exactly the case where executedPlan would be AQE-wrapped
    // (AdaptiveSparkPlanExec is a LeafExecNode and hides the tree);
    // scanning sparkPlan must still see the expression. Uses the SAME
    // fallbackClassesOf the tool runs, per the one-implementation rule.
    // (spark.range, not a local Seq: ConvertToLocalRelation would
    // evaluate a local projection at optimize time and leave nothing
    // to scan.)
    val probe = spark.range(8)
      .groupBy(expr("reflect('java.lang.String', 'valueOf', id % 2)").as("k"))
      .count()
    assert(probe.queryExecution.executedPlan.getClass.getSimpleName
      .contains("Adaptive"), "probe must exercise the AQE-wrapped case")
    val seen = graft.tools.PlanAudit.fallbackClassesOf(probe.queryExecution.sparkPlan)
    assert(seen.nonEmpty, "fallback scanner failed to detect a known CodegenFallback")
  }
}
