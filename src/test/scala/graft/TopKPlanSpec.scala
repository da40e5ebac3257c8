package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKPerGroup, TopKPerGroupFinalExec, TopKPerGroupPartialExec}

/** The custom whole-operator plan (TopKPerGroupNode + strategy +
  * partial/final execs): result parity with the declarative
  * rank-filter form, the planned physical shape, and the edge cases
  * (small groups, k ≥ group size, empty input).
  */
class TopKPlanSpec extends AnyFunSuite {
  import TestSpark._

  private def windowForm(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  private def heapForm(k: Int) =
    TopKPerGroup.topKPerGroup(
      Tables.customer(spark, sf)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
      Seq(col("c_nationkey")),
      Seq(col("c_acctbal").desc, col("c_custkey")),
      k)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("c_nationkey"),
      r.getAs[Long]("c_custkey"), r.getAs[Double]("c_acctbal"),
      r.getAs[Long]("rank"))).toSet

  test("heap operator equals the window rank-filter form row for row, rank included") {
    assert(asSet(heapForm(3)) == asSet(windowForm(3)))
    // k larger than every group: full table comes back, fully ranked
    assert(asSet(heapForm(100000)) == asSet(windowForm(100000)))
  }

  test("physical plan is Final <- Exchange <- Partial with no sort below the exchange") {
    val df = heapForm(3)
    df.collect() // materialize the adaptive final plan
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroupFinal"), s)
    assert(s.contains("TopKPerGroupPartial"), s)
    assert(s.contains("Exchange hashpartitioning"), s)
    // the whole point: no per-partition Sort anywhere in this plan
    assert(!s.contains("+- Sort"), s)
    // partial sits below the exchange: it appears after it in the tree string
    assert(s.indexOf("TopKPerGroupPartial") > s.indexOf("Exchange"), s)
  }

  test("expression group keys and empty input behave") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 5L), (4L, 40L))
      .toDF("id", "v")
    // group by parity expression, top-1 by v desc with id tie-break
    val got = TopKPerGroup.topKPerGroup(df,
        Seq(col("id") % 2), Seq(col("v").desc, col("id")), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // odd ids {1:10, 3:5} -> (1,10); even ids {2:20, 4:40} -> (4,40)
    assert(got == Set((1L, 10L, 1L), (4L, 40L, 1L)))
    val empty = TopKPerGroup.topKPerGroup(df.filter(col("id") < 0),
      Seq(col("id") % 2), Seq(col("v").desc, col("id")), 3)
    assert(empty.count() == 0L)
  }
}
